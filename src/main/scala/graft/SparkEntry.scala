package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Dedup, LayerADemo, Multimodal, Relational, Similarity,
  Streaming, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  private def optional: Seq[(String, (SparkSession, String) => DataFrame,
    Option[String])] =
    LayerADemo.all ++ graft.queries.Invariants.all ++ Dedup.all ++
      Similarity.all ++ TextAnalysis.all ++ graft.queries.Curation.all ++
      graft.queries.Sketches.all ++
      graft.queries.Sampling.all ++ graft.queries.Linkage.all ++
      Multimodal.all ++ Streaming.all ++ graft.queries.Skew.all ++
      graft.queries.AsOf.all ++ graft.queries.RangeJoin.all ++
      graft.queries.Sources.all ++ graft.queries.Layout.all ++
      graft.queries.Graph.all ++ graft.queries.Privacy.all ++ Seq(
        ("q18_approx_distinct", Relational.q18ApproxDistinct _, None),
        ("q18_exact_distinct", Relational.q18ExactDistinct _,
          Some(Relational.q18ExactSql)),
        ("q20_approx_percentiles", Relational.q20ApproxPercentiles _, None))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all.map { case (name, fn, _) => name -> fn }.toMap ++
      optional.map { case (name, fn, _) => name -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (seeded random generators/mutators, hash-based sketches) →
    * rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.all.map { case (name, _, sql) => name -> sql }.toMap ++
      optional.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
