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
