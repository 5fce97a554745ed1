package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: the KMV error-contract sweep (the sketch's
  * 1/√k accuracy scaling measured, not assumed) and gr03 plan/algebra
  * pins live in Round5dSpec. */
class Round8Spec extends SparkSpec {

  test("sk01 k-sweep: KMV relative error shrinks ~1/sqrt(k) on a " +
    "1M-distinct stream (k in {64, 256, 1024})") {
    import graft.expr.KmvSketchAgg.{estimateDistinct, kmvSketch}
    // synthetic 1M-DISTINCT stream, independent of the testdata draw:
    // range ids through xxhash64 — deterministic, so the measured
    // errors are stable run to run and the bounds are pinned, not
    // probabilistic. KMV theory (Bar-Yossef et al. 2002; Beyer et al.
    // 2007 for the (k−1)/u(k) unbiased form): relative standard error
    // ≈ 1/√(k−2), so k=64 → 12.7%, k=256 → 6.3%, k=1024 → 3.1%.
    val n = 1000000L
    val hashed = spark.range(n).select(xxhash64(col("id")).as("h"))
    val ks = Seq(64, 256, 1024)
    val errs = ks.map { k =>
      val sk = hashed.agg(kmvSketch(col("h"), k))
        .collect().head.getSeq[Long](0).toArray
      assert(sk.length == k, s"sketch must saturate at k=$k")
      assert(sk.sorted.sameElements(sk), "sketch must be sorted")
      val est = estimateDistinct(sk, k)
      val rel = math.abs(est - n) / n.toDouble
      info(f"k=$k%4d: est=$est%.0f rel_err=$rel%.4f " +
        f"(1 sigma = ${1.0 / math.sqrt(k - 2.0)}%.4f)")
      k -> rel
    }.toMap
    // each k within 3 standard errors of the truth
    ks.foreach { k =>
      val bound = 3.0 / math.sqrt(k - 2.0)
      assert(errs(k) <= bound,
        f"k=$k: rel error ${errs(k)}%.4f exceeds 3/sqrt(k-2) = $bound%.4f")
    }
    // the CONTRACT: 16x the memory must buy a materially tighter
    // estimate. One deterministic draw per k, so the comparison uses
    // the 3σ band of the larger k rather than the asymptotic 4x mean
    // ratio: err(1024) must sit inside err(64)'s expected band AND
    // below 64's one-σ floor.
    assert(errs(1024) <= 1.0 / math.sqrt(64 - 2.0),
      f"err(k=1024) = ${errs(1024)}%.4f should beat k=64's 1-sigma " +
        f"floor ${1.0 / math.sqrt(62.0)}%.4f")
  }

  test("sk01 k-sweep: union sketches inherit the same contract " +
    "(merge-and-trim loses no accuracy class)") {
    import graft.expr.KmvSketchAgg.{estimateDistinct, kmvSketch,
      unionSketch}
    // two half-overlapping 600k streams: |A ∪ B| = 900k exactly
    val a = spark.range(0L, 600000L)
      .select(xxhash64(col("id")).as("h"))
    val b = spark.range(300000L, 900000L)
      .select(xxhash64(col("id")).as("h"))
    Seq(256, 1024).foreach { k =>
      val sa = a.agg(kmvSketch(col("h"), k)).collect().head
        .getSeq[Long](0).toArray
      val sb = b.agg(kmvSketch(col("h"), k)).collect().head
        .getSeq[Long](0).toArray
      val eu = estimateDistinct(unionSketch(sa, sb, k), k)
      val rel = math.abs(eu - 900000.0) / 900000.0
      assert(rel <= 3.0 / math.sqrt(k - 2.0),
        f"k=$k union: rel error $rel%.4f exceeds 3/sqrt(k-2)")
    }
  }

  test("sk02 HLL: every partitioning's estimate lands within 3 sigma " +
    "of the 1M-distinct truth (merge drift stays inside the band)") {
    // Datasketches HLL at lgK=12: sigma ~ 1.04/sqrt(4096) ~ 1.6%.
    // Unlike KMV (whose k-mins are a pure function of the item set),
    // the HLL ESTIMATE is not partitioning-invariant: merging
    // per-partition sketches converts sparse->dense differently than
    // one sequential build (measured: 976,680 at 1 partition vs
    // 990,117 at 8 on the same 1M ids). The platform contract is
    // that every merge shape stays within the error band — pin that,
    // not byte/estimate equality.
    val n = 1000000L
    val sigma = 1.04 / math.sqrt(4096.0)
    val ests = Seq(1, 8, 32).map { parts =>
      val e = spark.range(n).repartition(parts)
        .agg(hll_sketch_estimate(hll_sketch_agg(col("id"), lit(12))))
        .collect().head.getLong(0)
      assert(math.abs(e - n) / n.toDouble <= 3 * sigma,
        s"$parts-partition estimate $e off by more than 3 sigma")
      e
    }
    // and the drift between merge shapes is itself sub-sigma-scale
    assert((ests.max - ests.min).toDouble / n <= 2 * sigma,
      s"merge-shape drift ${ests.max - ests.min} exceeds 2 sigma")
  }

  test("sk02 HLL overlap: in-plan estimator matches the exact truth " +
    "within the inv bounds on the gate corpus") {
    val rows = graft.queries.Sketches.hllInv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (6 to 9).foreach(i => assert(r.getBoolean(i),
        s"bound violated in row $r"))
    }
  }
}
