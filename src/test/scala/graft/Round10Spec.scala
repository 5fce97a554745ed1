package graft

import org.apache.spark.sql.functions._

/** Round-10 pins: the strftime coverage matrix against the
  * reference's actual usage, bpeTrain's bounded-vocabulary knobs, and
  * the stored/merged GK quantile state contract (sk04). */
class Round10Spec extends SparkSpec {

  // ------------------------------------------------------ strftime
  // Every format string the reference's tests/docs actually use
  // (grep over /root/reference/gecko, tests/, docs/: the full set is
  // %Y %m %d %H %M %S in four combinations — test_mutator.py:915-916,
  // test_generator.py, docs examples), pinned with the exact
  // Python-strftime rendering of a fixed instant so translation
  // errors show as string diffs, not just parse failures.
  test("strftime matrix: every reference-used format translates and " +
    "renders exactly as Python strftime would") {
    val instant = java.time.LocalDateTime.of(2021, 3, 4, 5, 6, 7)
    val cases = Seq( // (reference format, python strftime rendering)
      ("%Y-%m-%d %H:%M:%S", "2021-03-04 05:06:07"),
      ("%Y-%m-%d", "2021-03-04"),
      ("%d.%m.%Y %H:%M:%S", "04.03.2021 05:06:07"),
      ("%d.%m.%Y", "04.03.2021"))
    cases.foreach { case (fmt, want) =>
      val jdk = core.Strftime.toJava(fmt)
      val got = instant.format(
        java.time.format.DateTimeFormatter.ofPattern(jdk))
      assert(got == want, s"$fmt -> $jdk rendered `$got`, want `$want`")
    }
  }

  test("strftime matrix: the full documented code set translates; " +
    "codes outside it are rejected loudly") {
    // the engine's documented superset of the reference's usage
    val supported = "YymdHIMSjfpaAbB".toSeq
    supported.foreach { c =>
      assert(core.Strftime.toJava(s"%$c").nonEmpty, s"%$c must translate")
    }
    assert(core.Strftime.toJava("100%%") == "100%")
    val err = intercept[IllegalArgumentException] {
      core.Strftime.toJava("%Q")
    }
    assert(err.getMessage.contains("%Q"), err.getMessage)
    assert(intercept[IllegalArgumentException] {
      core.Strftime.toJava("broken%")
    }.getMessage.contains("dangling"))
  }

  // ------------------------------------------------- bpeTrain knobs
  test("bpeTrain floor: a vacuous minFreq/topN changes nothing on " +
    "the gate corpus") {
    val base = queries.TextAnalysis.bpeTrain(spark, sfDir, 8)
    val floored = queries.TextAnalysis.bpeTrain(spark, sfDir, 8,
      minFreq = 1L, topN = 0)
    assert(base == floored, "vacuous floor must be a no-op")
  }

  test("bpeTrain floor: minFreq drops sub-threshold words' pair " +
    "counts before the driver ever sees them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_floor")
      .toFile.getAbsolutePath
    import spark.implicits._
    // word freqs: aa x3, bb x2, cc x1 (the hapax)
    Seq((1L, "aa bb"), (2L, "aa bb"), (3L, "aa cc"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val unfloored = queries.TextAnalysis.bpeTrain(spark, dir, 3)
    assert(unfloored.map(r => (r._3.replace("\u001f", ""), r._4)) ==
      Seq(("aa", 3L), ("bb", 2L), ("cc", 1L)), unfloored.toString)
    // minFreq = 2: the hapax `cc` never reaches the driver, so the
    // trainer exhausts after two rules — identical prefix, no third
    val floored = queries.TextAnalysis.bpeTrain(spark, dir, 3,
      minFreq = 2L)
    assert(floored.map(r => (r._3.replace("\u001f", ""), r._4)) ==
      Seq(("aa", 3L), ("bb", 2L)), floored.toString)
    // topN = 1: only `aa` survives the cap
    val capped = queries.TextAnalysis.bpeTrain(spark, dir, 3, topN = 1)
    assert(capped.map(r => (r._3.replace("\u001f", ""), r._4)) ==
      Seq(("aa", 3L)), capped.toString)
  }

  // ------------------------------- sk04 stored/merged GK state (MV)
  test("gk state: serialize/deserialize round-trips count and " +
    "queries; split-build + merge answers within the rank band of " +
    "a single-pass build (the c08 merge==recompute contract)") {
    import graft.expr.GkStateCodec
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    val n = 30000
    val acc = 1000
    def fresh() = new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, 1.0 / acc)
    // deterministic, shuffled-ish insertion order (seeded)
    val xs = new scala.util.Random(42).shuffle((1 to n).toVector)
    val whole = xs.foldLeft(fresh())((qs, x) => qs.insert(x.toDouble))
    // three "epochs"
    val parts = xs.grouped(n / 3 + 1).map(chunk =>
      chunk.foldLeft(fresh())((qs, x) => qs.insert(x.toDouble))).toSeq
    val merged = parts.map(GkStateCodec.serialize)
      .map(GkStateCodec.deserialize)
      .reduce(GkStateCodec.mergeStates)
    assert(merged.count == n.toLong)
    val rt = GkStateCodec.deserialize(GkStateCodec.serialize(whole))
    assert(rt.count == whole.compress().count)
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val eps = 2.0 * n / acc + 1
      val target = q * n
      val em = merged.query(q).get
      val ew = rt.query(q).get
      // values ARE ranks here (1..n), so the rank check is direct
      assert(math.abs(em - target) <= eps,
        s"merged q=$q est=$em target=$target eps=$eps")
      assert(math.abs(ew - target) <= eps,
        s"whole q=$q est=$ew target=$target eps=$eps")
    }
  }

  test("sk04 end to end: per-epoch stored states, merged, agree " +
    "with a direct whole-corpus gk_sketch within the 2eps rank band") {
    import graft.expr.GkSketchAgg._
    val v = queries.Relational.table(spark, sfDir, "events")
      .select(col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))
          * 1000000).cast("long").as("m"))
    val direct = v.groupBy("event_type")
      .agg(gkSketch(col("m"), 1000).as("st"))
      .select(col("event_type"), gkCount(col("st")).as("n"),
        gkEstimate(col("st"), 0.5).as("d50"),
        gkEstimate(col("st"), 0.99).as("d99"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val viaEpochs = queries.Sketches.gkProfile(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(direct.keySet == viaEpochs.keySet)
    // exact rank of an estimate, computed independently per type
    val sorted = v.collect().groupBy(_.getString(0))
      .map { case (t, rows) => t -> rows.map(_.getLong(1)).sorted }
    direct.keys.foreach { t =>
      val (nD, d50, d99) = direct(t)
      val (nM, m50, m99) = viaEpochs(t)
      assert(nD == nM && nD == sorted(t).length.toLong, s"$t counts")
      def rankOf(x: Double): Long = sorted(t).count(_ <= x).toLong
      val eps = 2 * (nD / 1000) + 1
      for ((est, q) <- Seq((m50.toDouble, 0.5), (m99.toDouble, 0.99),
        (d50, 0.5), (d99, 0.99))) {
        val target = math.ceil(q * nD).toLong
        val r = rankOf(est)
        assert(math.abs(r - target) <= eps,
          s"$t q=$q est=$est rank=$r target=$target eps=$eps")
      }
    }
  }

  test("sk04 plan shape: the profile stage reads ONLY the persisted " +
    "state table — the corpus is scanned once, at state-build time") {
    val profile = queries.Sketches.gkProfile(spark, sfDir)
    val plan = profile.queryExecution.executedPlan.toString
    assert(plan.contains("graft_sk04"),
      s"profile must scan the persisted state table:\n$plan")
    assert(!plan.contains("events.parquet"),
      s"profile stage must not rescan the corpus:\n$plan")
  }

  test("sk05 estimator inputs are sketch readouts: the FK estimate " +
    "lands within the oracle band and the self-join lower bound " +
    "holds strictly below exact on the skewed key") {
    val rows = queries.Sketches.joinCardinality(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val (exOL, estOL, okOL) = rows("orders-lineitem")
    val (exEE, estEE, okEE) = rows("events-events")
    assert(okOL && okEE)
    assert(math.abs(estOL - exOL) <= exOL / 2 + 1024,
      s"FK est $estOL vs exact $exOL")
    // Cauchy-Schwarz: uniform-multiplicity estimate can exceed exact
    // only through sketch error on d, never through the bound itself
    assert(estEE <= exEE * 11 / 10, s"lower bound $estEE vs $exEE")
  }

  test("gk SQL surface: gk_sketch/gk_merge/gk_estimate/gk_count " +
    "registered and bit-consistent with the column API") {
    GraftExtensions.register(spark)
    queries.Relational.table(spark, sfDir, "events")
      .createOrReplaceTempView("r10_events")
    val sql = spark.sql("""
      SELECT gk_count(st) AS n,
             gk_estimate(st, 0.5) AS q50
      FROM (
        SELECT gk_merge(st) AS st FROM (
          SELECT gk_sketch(CAST(value * 1000000 AS BIGINT), 1000) AS st
          FROM r10_events GROUP BY event_type))""").collect()(0)
    assert(sql.getLong(0) > 0L && !sql.isNullAt(1))
  }
}

/** Property fuzz for the versioned GK state codec: arbitrary insert
  * streams, arbitrary split points — serialize/deserialize must be
  * lossless (count + every queried quantile identical) and merge of
  * round-tripped parts must answer within the rank band. Stored
  * bytes outlive the process that wrote them, so the codec gets a
  * property test, not just the happy path. */
class GkCodecPropertySpec extends SparkSpec {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries
  import graft.expr.GkStateCodec
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val acc = 200

  private def fresh() = new QuantileSummaries(
    QuantileSummaries.defaultCompressThreshold, 1.0 / acc)

  test("codec round-trip is lossless and split+merge stays in band " +
    "over 40 arbitrary streams") {
    val gen = Gen.listOfN(40, for {
      n <- Gen.chooseNum(1, 5000)
      scale <- Gen.oneOf(1.0, 1e-6, 1e6, -1.0)
      split <- Gen.chooseNum(0, n)
    } yield (n, scale, split))
    val cases = gen(Gen.Parameters.default, Seed(4242L)).get
    cases.foreach { case (n, scale, split) =>
      val rnd = new scala.util.Random(n * 31 + split)
      val xs = Vector.fill(n)(rnd.nextInt(1000000) * scale)
      val whole = xs.foldLeft(fresh())((q, x) => q.insert(x))
      val rt = GkStateCodec.deserialize(GkStateCodec.serialize(whole))
      val wholeC = whole.compress()
      assert(rt.count == wholeC.count, s"count drift n=$n")
      for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.99))
        assert(rt.query(q) == wholeC.query(q),
          s"query($q) drift after round-trip n=$n scale=$scale")
      val (a, b) = xs.splitAt(split)
      val merged = Seq(a, b).map(part =>
        GkStateCodec.deserialize(GkStateCodec.serialize(
          part.foldLeft(fresh())((q, x) => q.insert(x)))))
        .reduce(GkStateCodec.mergeStates)
      assert(merged.count == n.toLong, s"merged count n=$n split=$split")
      val sorted = xs.sorted
      for (q <- Seq(0.25, 0.5, 0.9)) {
        val est = merged.query(q).get
        val rank = sorted.count(_ <= est)
        val target = math.ceil(q * n)
        assert(math.abs(rank - target) <= 2.0 * n / acc + 1,
          s"merged rank out of band n=$n split=$split q=$q " +
            s"rank=$rank target=$target")
      }
    }
  }

  test("codec rejects foreign versions loudly") {
    val bytes = GkStateCodec.serialize(fresh().insert(1.0))
    bytes(0) = 99
    val e = intercept[IllegalArgumentException] {
      GkStateCodec.deserialize(bytes)
    }
    assert(e.getMessage.contains("version"), e.getMessage)
  }
}
