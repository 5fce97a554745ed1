package graft

import org.apache.spark.sql.functions._
import graft.queries.{Relational, Sampling}

/** Deterministic-sampling contracts: layout invariance, realized
  * fractions, subset/stability under corpus growth. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Relational.table(spark, sfDir, "documents")
    .select(col("doc_id"), col("lang"))

  test("deterministicSample: fraction realized, independent of " +
    "partition layout") {
    val n = docs.count().toDouble
    def ids(parts: Int): Array[Long] =
      Sampling.deterministicSample(docs.repartition(parts), col("doc_id"),
          0.3, seed = 7)
        .select("doc_id").collect().map(_.getLong(0)).sorted
    val a = ids(1)
    assert(a.sameElements(ids(8)), "sample changed with partition layout")
    assert(math.abs(a.length / n - 0.3) < 0.08,
      s"realized fraction ${a.length / n}")
    // decision is per-key: a different seed draws a different subset
    val b = Sampling.deterministicSample(docs, col("doc_id"), 0.3,
      seed = 8).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(!a.sameElements(b))
  }

  test("deterministicSample: stability — a row's fate never changes " +
    "when the corpus grows") {
    val half = docs.filter(col("doc_id") < 250)
    val keptHalf = Sampling.deterministicSample(half, col("doc_id"), 0.5,
      seed = 11).select("doc_id").collect().map(_.getLong(0)).toSet
    val keptFull = Sampling.deterministicSample(docs, col("doc_id"), 0.5,
      seed = 11).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptHalf == keptFull.filter(_ < 250))
  }

  test("stratifiedSample: per-stratum fractions realized; unknown " +
    "strata dropped") {
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fractions = Map("en" -> 0.25, "zh" -> 1.0)
    val got = Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
        fractions, seed = 13)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only the listed strata survive
    assert(got.keySet.subsetOf(fractions.keySet))
    assert(got.getOrElse("zh", 0L) == byLang("zh")) // fraction 1.0 = all
    val enRate = got.getOrElse("en", 0L).toDouble / byLang("en")
    assert(math.abs(enRate - 0.25) < 0.1, s"en realized $enRate")
  }

  test("sampling plan: pure filter, no shuffle, no UDF") {
    val plan = Sampling.deterministicSample(docs, col("doc_id"), 0.5,
      seed = 17).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n$plan")
    assert(!plan.contains("ScalaUDF"))
  }

  test("mixtureSample: per-source token totals track the target " +
    "mixture; selection is layout-invariant; invalid targets rejected") {
    val full = Relational.table(spark, sfDir, "documents")
    val targets = Map("src0" -> 0.4, "src1" -> 0.35, "src2" -> 0.25)
    def run(parts: Int) =
      Sampling.mixtureSample(full.repartition(parts), targets)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1)
    val a = run(1)
    assert(a.sameElements(run(16)), "selection changed with layout")
    // realized shares track targets (greedy underfill: each of the 8
    // shards may leave up to one doc of budget unused)
    val bySrc = a.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = bySrc.values.sum.toDouble
    targets.foreach { case (src, share) =>
      val realized = bySrc(src) / total
      assert(math.abs(realized - share) < 0.1,
        s"$src realized $realized vs target $share")
    }
    // no upsampling: kept tokens never exceed the source's corpus total
    val observed = full.filter(col("source").isin("src0", "src1", "src2"))
      .groupBy("source").agg(sum(size(split(col("text"), " "))).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, t) => assert(t <= observed(src)) }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(full, Map("src0" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(full, Map("no_such_source" -> 1.0))
    }
  }

  test("s22: leakage safety — no near-dup cluster ever straddles a " +
    "split boundary, and the manifest conserves the corpus") {
    // recompute the per-doc assignment the manifest aggregates, then
    // assert the defining property: one bucket per cluster
    val members = queries.Dedup.clusterChain(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    val perDoc = docs.select(col("doc_id"))
      .join(members, Seq("doc_id"), "left")
      .withColumn("cluster_id",
        org.apache.spark.sql.functions.coalesce(col("cluster_id"),
          col("doc_id")))
      .withColumn("u", conv(substring(
        md5(concat(lit("s22#"), col("cluster_id"))), 1, 8), 16, 10)
        .cast("long"))
      .withColumn("bucket",
        when(col("u") * 10 < 8L * 4294967296L, "train")
          .when(col("u") * 10 < 9L * 4294967296L, "val")
          .otherwise("test"))
    val straddlers = perDoc.groupBy("cluster_id")
      .agg(countDistinct(col("bucket")).as("nb"))
      .filter(col("nb") > 1).count()
    assert(straddlers == 0, "a cluster crossed a split boundary")
    val manifest = Sampling.leakageSafeSplit(spark, sfDir).collect()
    assert(manifest.map(_.getLong(1)).sum == docs.count(),
      "manifest must conserve the corpus")
    assert(manifest.map(_.getString(0)).sorted.toSeq ==
      Seq("test", "train", "val"))
  }
}
