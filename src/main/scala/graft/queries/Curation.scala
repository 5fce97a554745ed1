package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed curation pipeline — the "a user could switch" showcase:
  * the stages every training-data pipeline chains (exact dedup → PII
  * scrub → quality gate → language gate) run as ONE declarative plan,
  * verified end-to-end by a single exact DuckDB oracle. Each stage
  * changes the surviving set, so a hash match proves the composition,
  * not just the parts.
  *
  * Scale shape: one shuffle for the dedup groupBy (keyed on the text
  * hash); everything after is a stateless scan-speed select — the
  * filters are codegen'd predicates fused into one WholeStageCodegen
  * span, no joins, no further shuffles. At 100 TB the cost is the
  * dedup exchange plus one pass.
  */
object Curation {

  /** Quality gate: ≥ MinTokens whitespace tokens and ≥ half of them
    * distinct. Integer arithmetic only, so both engines agree exactly. */
  private val MinTokens = 12

  /** c01 — survivors of dedup → scrub → quality → language, with the
    * per-doc stats each stage produced. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = Relational.table(s, dir, "documents")
    // stage 1: exact dedup, min-id survivor per identical text
    val kept = docs.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
    // stage 2: PII plant (synthetic corpus carries none) + scrub
    val scrubbed = TextAnalysis.redact(TextAnalysis.piiPlant(kept))
    // stage 3 + 4: quality + language signals on the REDACTED text
    val toks = split(col("redacted"), " ")
    val enWords = TextAnalysis.LangStopwords.toMap.apply("en")
    val gated = scrubbed
      .withColumn("n_pii",
        col("n_emails") + col("n_phones") + col("n_ips"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_unique", size(array_distinct(toks)).cast("long"))
      .withColumn("en_hits", size(filter(toks,
        t => enWords.map(w => t === w).reduce(_ || _))).cast("long"))
      .filter(col("n_tokens") >= MinTokens &&
        col("n_unique") * 2 >= col("n_tokens") &&
        col("en_hits") >= 1)
    gated.select("doc_id", "n_pii", "n_tokens", "n_unique", "en_hits")
      .orderBy("doc_id")
  }

  /** One oracle for the whole chain, each stage a CTE built from the
    * same shared SQL generators the per-stage oracles use. */
  val curationPipelineSql: String = {
    val enList = TextAnalysis.LangStopwords.toMap.apply("en")
      .map(w => s"'${w.replace("'", "''")}'").mkString(",")
    s"""
    WITH kept AS (
      SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
    planted AS (${TextAnalysis.piiPlantSql("kept")}),
    scrubbed AS (${TextAnalysis.redactSqlOver("planted")}),
    gated AS (
      SELECT doc_id,
        n_emails + n_phones + n_ips AS n_pii,
        len(string_split(redacted, ' ')) AS n_tokens,
        len(list_distinct(string_split(redacted, ' '))) AS n_unique,
        len(list_filter(string_split(redacted, ' '),
          t -> t IN ($enList))) AS en_hits
      FROM scrubbed)
    SELECT doc_id, n_pii, n_tokens, n_unique, en_hits
    FROM gated
    WHERE n_tokens >= $MinTokens
      AND n_unique * 2 >= n_tokens
      AND en_hits >= 1
    ORDER BY doc_id"""
  }

  /** c02 — the per-(source, lang) data card: the summary table every
    * corpus release ships (doc counts, token/char volumes, share
    * passing the quality gate). All-integer aggregates, so the oracle
    * is exact. One partial-agg shuffle over a tiny (source × lang) key
    * space — at 100 TB this is a map-side-combine scan pass. */
  def sourceDatacard(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nTokens = size(toks).cast("long")
    val nUnique = size(array_distinct(toks)).cast("long")
    Relational.table(s, dir, "documents")
      .select(col("source"), col("lang"), col("n_chars"), nTokens
        .as("n_tokens"),
        (nTokens >= MinTokens && nUnique * 2 >= nTokens).cast("long")
          .as("quality_ok"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("quality_ok")).as("n_quality"))
      .orderBy("source", "lang")
  }

  val sourceDatacardSql: String = s"""
    SELECT source, lang, count(*) AS n_docs,
      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      CAST(sum(n_chars) AS BIGINT) AS total_chars,
      CAST(sum(CASE WHEN len(string_split(text, ' ')) >= $MinTokens
        AND len(list_distinct(string_split(text, ' '))) * 2 >=
          len(string_split(text, ' '))
        THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("c01_curation_pipeline", curationPipeline _,
        Some(curationPipelineSql)),
      ("c02_source_datacard", sourceDatacard _, Some(sourceDatacardSql)))
}
