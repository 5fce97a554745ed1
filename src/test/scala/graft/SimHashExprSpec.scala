package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Bit-parity and analysis contracts for the native
  * [[graft.expr.SimHash64]] expression (d03's corpus-scan kernel). */
class SimHashExprSpec extends SparkSpec {

  test("native simhash64 == reference Scala formulation for every " +
    "corpus document (incl. empty/multi-space edge rows)") {
    import spark.implicits._
    val docs = queries.Relational.table(spark, sfDir, "documents")
      .select(col("text")).as[String].collect().toSeq ++
      Seq("", " ", "  ", "one", "one two", "a  b ", "trailing space ")
    val refUdf = udf(Dedup.simhash64 _)
    val mismatches = docs.toDF("text")
      .select(graft.expr.SimHash64.simhash64(col("text")).as("native"),
        refUdf(col("text")).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("sql surface: simhash64 registered and null-safe") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT simhash64('hello world') AS h, simhash64(NULL) AS n")
      .collect().head
    assert(out.getLong(0) == Dedup.simhash64("hello world"))
    assert(out.isNullAt(1))
  }

  test("analysis-time rejection of non-string input") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT simhash64(array(1, 2))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
