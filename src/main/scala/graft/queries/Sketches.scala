package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch heavy hitters — the streaming-friendly frequency
  * sketch (Cormode & Muthukrishnan 2005). The sketch build is ONE
  * partial-agg shuffle onto a FIXED d×w key space (4×1024 cells —
  * collapses to ≤4096 rows per task regardless of corpus size), and
  * point queries join the candidate set against the tiny materialized
  * sketch via broadcast. At 100 TB the sketch stays 4096 cells; only
  * the map-side scan grows.
  *
  * The CMS overestimate-only property (est ≥ true, always — every
  * collision adds, nothing subtracts) is deterministic given the data
  * and seeds, which makes it an exact invariant the DuckDB oracle can
  * check: the oracle recomputes true counts and asserts the flags the
  * Spark side derived from the sketch.
  */
object Sketches {

  private val D = 4
  private val W = 1024
  private val Seeds = Seq(1, 2, 3, 4)
  private val TopK = 30

  private def tokenStream(s: SparkSession, dir: String): DataFrame =
    Relational.table(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")

  /** The d×w sketch: every token occurrence lands in one bucket per
    * hash row. xxhash64 seeded by row index keeps the d rows
    * independent. */
  private def sketch(toks: DataFrame): DataFrame =
    toks.select(posexplode(array(Seeds.map(sd =>
        pmod(xxhash64(lit(sd), col("token")), lit(W))): _*)))
      .toDF("row", "bucket")
      .groupBy("row", "bucket").agg(count(lit(1)).as("c"))

  /** t12 — heavy hitters: CMS point-query estimates for the exact
    * top-K tokens, next to their true counts. est ≥ true always; at
    * these scales the 4-row min keeps est within a few counts of
    * true. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = tokenStream(s, dir)
    val top = toks.groupBy("token").agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("token")).limit(TopK)
    val probes = top.select(col("token"), col("n_true"),
      posexplode(array(Seeds.map(sd =>
        pmod(xxhash64(lit(sd), col("token")), lit(W))): _*)))
      .toDF("token", "n_true", "row", "bucket")
    probes.join(broadcast(sketch(toks)), Seq("row", "bucket"))
      .groupBy("token", "n_true").agg(min(col("c")).as("est"))
      .orderBy(col("n_true").desc, col("token"))
  }

  /** t12's invariant projection, fully oracle-checked: the oracle
    * recomputes the exact top-K and asserts the deterministic CMS
    * contract — the sketch never underestimates. */
  def cmsInv(s: SparkSession, dir: String): DataFrame =
    heavyHitters(s, dir).select(col("token"), col("n_true"),
      (col("est") >= col("n_true")).as("overestimate_ok"))

  val cmsInvSql: String = s"""
    SELECT t AS token, count(*) AS n_true, TRUE AS overestimate_ok
    FROM (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents)
    WHERE t <> ''
    GROUP BY t
    ORDER BY n_true DESC, t
    LIMIT $TopK"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("t12_heavy_hitters", heavyHitters _, None),
      ("t12_cms_inv", cmsInv _, Some(cmsInvSql)))
}
