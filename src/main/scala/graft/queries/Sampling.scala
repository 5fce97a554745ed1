package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines
  * (absent in the reference — Layer B north-star).
  *
  * `df.sample()` draws from a per-partition RNG, so its output changes
  * with the partition layout — unacceptable for reproducible corpus
  * construction at 100 TB where partitioning is an execution detail.
  * These operators gate each row on a hash of its KEY instead: the
  * decision is a pure function of (key, seed), stable under shuffles,
  * re-runs, cluster sizes, and incremental reprocessing (a row's fate
  * never changes when the corpus around it grows). Pure codegen'd
  * expressions — no RNG state, no UDFs, no shuffle. */
object Sampling {

  private val Buckets = 1000000L

  /** Keep ~`fraction` of rows, decided by hash(key, seed). */
  def deterministicSample(df: DataFrame, keyCol: Column, fraction: Double,
                          seed: Long): DataFrame = {
    require(fraction >= 0 && fraction <= 1,
      s"fraction must be in [0, 1], is $fraction")
    df.filter(bucketOf(keyCol, seed) < (fraction * Buckets).toLong)
  }

  /** Per-stratum keep fractions (strata absent from the map are
    * dropped) — e.g. downsample dominant languages, keep the tail. */
  def stratifiedSample(df: DataFrame, strataCol: Column, keyCol: Column,
                       fractions: Map[String, Double],
                       seed: Long): DataFrame = {
    fractions.values.foreach(f => require(f >= 0 && f <= 1,
      s"fraction must be in [0, 1], is $f"))
    val threshold = fractions.foldLeft(lit(0L)) {
      case (acc, (stratum, f)) =>
        when(strataCol === lit(stratum),
          lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(bucketOf(keyCol, seed) < threshold)
  }

  private def bucketOf(keyCol: Column, seed: Long): Column =
    pmod(xxhash64(keyCol, lit(seed)), lit(Buckets))

  /** Demo: downsample English, keep most of the tail languages.
    * Hash-gated => rows-only driver check; SamplingSpec asserts the
    * realized fractions, determinism across layouts, and the
    * subset/stability contracts. */
  def stratifiedDemo(s: SparkSession, dir: String): DataFrame =
    stratifiedSample(
      Relational.table(s, dir, "documents")
        .select(col("doc_id"), col("lang")),
      col("lang"), col("doc_id"),
      Map("en" -> 0.25, "de" -> 0.8, "fr" -> 0.8, "es" -> 0.8,
        "zh" -> 1.0),
      seed = 4242)
      .orderBy("doc_id")

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("s03_stratified_sample", stratifiedDemo _, None),
    )
}
