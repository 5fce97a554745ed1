package graft

import org.apache.spark.sql.functions._

/** Round-9 pins: the production BPE trainer's parity with the in-plan
  * demo loop and its merge-count envelope, plus pv05's randomized-
  * response mechanism (flip rate, debiasing algebra). */
class Round9Spec extends SparkSpec {

  test("bpeTrain parity: the driver-side trainer induces exactly the " +
    "in-plan loop's rules for the oracle-checked 3 rounds") {
    val demo = queries.TextAnalysis.bpeMerges(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val trained = queries.TextAnalysis.bpeTrain(spark, sfDir, 3)
      .map { case (r, _, merged, cnt) =>
        (r, merged.replace("\u001f", ""), cnt) }
    assert(demo.nonEmpty && demo == trained,
      s"demo=$demo trained=$trained")
  }

  test("bpeTrain envelope: 16 merge rounds complete with monotone " +
    "round numbering, positive freq-weighted counts, and growing " +
    "merged tokens — zero per-round Spark jobs") {
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .length
    val rules = queries.TextAnalysis.bpeTrain(spark, sfDir, 16)
    val jobsRun = spark.sparkContext.statusTracker
      .getJobIdsForGroup(null).length - before
    assert(rules.length == 16, s"got ${rules.length} rules")
    assert(rules.map(_._1) == (1 to 16), "round numbering broken")
    assert(rules.forall(_._4 > 0L), "non-positive pair count")
    // merged symbols must strictly grow the vocabulary: each round's
    // replacement token is new (BPE never re-derives an existing rule)
    val merged = rules.map(_._3)
    assert(merged.distinct.length == merged.length, "duplicate rule")
    // the whole 16-round loop runs on the collected vocab: only the
    // ONE vocab-build job (plus any AQE sub-jobs of that single
    // action) touches the cluster — well under one job per merge
    assert(jobsRun < 16, s"$jobsRun jobs for 16 driver-side rounds")
  }

  test("sk03 quantile sketch: GK rank contract green on the gate " +
    "corpus, exact ranks match brute force, and the estimate stays " +
    "in-band under different merge trees") {
    val inv = queries.Sketches.quantileInv(spark, sfDir).collect()
    assert(inv.nonEmpty)
    inv.foreach { r =>
      (5 to 7).foreach(i => assert(r.getBoolean(i),
        s"GK rank contract violated: $r"))
    }
    // brute-force one type's exact q50: value at rank ceil(n/2) of the
    // sorted micros — must equal the operator's exact column
    val clickRow = inv.find(_.getString(0) == "click").get
    val micros = queries.Streaming.events(spark, sfDir)
      .filter(col("event_type") === "click")
      .select((col("value")
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)) * 1000000)
        .cast("long")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(clickRow.getLong(2) == micros((micros.length + 1) / 2 - 1),
      "exact_q50 != brute-force rank value")
    // the estimate itself may vary with the merge tree (why sk03 is
    // rows-only) — but every partitioning must satisfy the rank band
    for (nParts <- Seq(1, 5, 13)) {
      val est = spark.range(10000)
        .repartition(nParts)
        .selectExpr("CAST(id * id AS BIGINT) AS m") // skewed domain
        .agg(percentile_approx(col("m"), lit(0.9), lit(1000)))
        .collect().head.getLong(0)
      val rank = math.ceil(math.sqrt(est.toDouble)).toLong + 1 // #{m<=est}
      assert(math.abs(rank - 9000L) <= 10000 / 1000 + 1,
        s"nParts=$nParts est=$est rank=$rank")
    }
  }

  test("pv05 randomized response: the keyed flip realizes rate 1/4, " +
    "and the debiased estimator recovers the true count within " +
    "sampling noise") {
    // the mechanism's flip draw over 200k distinct keys (same md5
    // expression the release uses): P(flip) = P(u mod 4 == 0) = 1/4
    val flips = spark.range(200000)
      .select((pmod(conv(substring(
        md5(concat(lit("pv05#"), col("id"))), 1, 8), 16, 10)
        .cast("long"), lit(4L)) === 0L).cast("long").as("f"))
      .agg(sum("f")).collect().head.getLong(0)
    val rate = flips / 200000.0
    assert(math.abs(rate - 0.25) < 0.01, s"flip rate $rate")

    val rel = queries.Privacy.randomizedResponse(spark, sfDir).collect()
    assert(rel.nonEmpty)
    // every row is internally consistent: est = 2000*yes - 500*n
    rel.foreach { r =>
      assert(r.getLong(3) == 2000L * r.getLong(2) - 500L * r.getLong(1))
      assert(r.getLong(4) == 1098612L) // ε = ln 3
    }
    // corpus-level debiasing: Σ est ≈ Σ true within ~4σ of the
    // estimator's sampling noise (σ = √(n·p(1−p))/(2p−1), p = 3/4)
    val trueTotal = graft.queries.Relational
      .table(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").count()
    val n = rel.map(_.getLong(1)).sum
    val est = rel.map(_.getLong(3)).sum / 1000.0
    val sigma = math.sqrt(n * 3.0 / 16.0) / 0.5
    assert(math.abs(est - trueTotal) < 4 * sigma + 1,
      s"est $est vs true $trueTotal (n=$n, sigma=$sigma)")
  }
}
