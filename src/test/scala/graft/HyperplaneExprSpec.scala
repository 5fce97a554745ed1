package graft

import org.apache.spark.sql.functions._
import graft.expr.HyperplaneBuckets
import graft.queries.Similarity

/** Parity + contract for the native LSH bucket expression: the
  * codegen'd kernel must emit bit-identical buckets to the reference
  * Scala formulation (signBucket over hyperplanes) it replaces in the
  * s02 corpus scan. */
class HyperplaneExprSpec extends SparkSpec {
  import spark.implicits._

  test("expression buckets == scala signBucket over the same seeded " +
    "planes, for every corpus vector and table") {
    val emb = graft.queries.Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val tables = (0 until 6).map(t =>
      (t, Similarity.hyperplanes(5, 64, 7000 + t)))
    val udfBuckets = udf { (v: Seq[Float]) =>
      tables.map { case (t, planes) =>
        t.toLong << 32 | Similarity.signBucket(v, planes)
      }
    }
    val mismatches = emb.select(
        HyperplaneBuckets.hyperplaneBuckets(col("embedding"),
          6, 5, 64, 7000L).as("native"),
        udfBuckets(col("embedding")).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("sql surface: hyperplane_buckets registered and callable") {
    graft.GraftExtensions.register(spark)
    spark.range(1).selectExpr("id").createOrReplaceTempView("hb_dummy")
    val row = spark.sql(
      """SELECT hyperplane_buckets(array(CAST(1.0 AS FLOAT),
        |  CAST(-2.0 AS FLOAT)), 2, 3, 2, 42L) AS b""".stripMargin)
      .head().getSeq[Long](0)
    assert(row.length == 2)
    assert((row(0) >> 32) == 0 && (row(1) >> 32) == 1,
      "table id must ride the high bits")
  }

  test("d05 config (1 table, 12 planes, seed 4242) == scala " +
    "signBucket over hyperplanes(12, 64, 4242) for every vector") {
    val planes = Similarity.hyperplanes(12, 64, seed = 4242)
    val refUdf = udf((v: Seq[Float]) => Similarity.signBucket(v, planes))
    val mismatches = graft.queries.Relational
      .table(spark, sfDir, "embeddings")
      .select(
        element_at(graft.expr.HyperplaneBuckets.hyperplaneBuckets(
          col("embedding"), 1, 12, 64, 4242L), 1).as("native"),
        refUdf(col("embedding")).cast("long").as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("pq encode expression == scala pqEncode for every corpus " +
    "vector (trained codebooks through addReferenceObj)") {
    val emb = graft.queries.Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cbs = Similarity.pqCodebooks(emb, seed = 11000)
    val refUdf = udf((v: Seq[Float]) => Similarity.pqEncode(v, cbs))
    val mismatches = emb.select(
        graft.expr.PqEncode.pqEncode(col("embedding"), cbs).as("native"),
        refUdf(col("embedding")).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("analysis-time rejection of non-float arrays") {
    graft.GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_buckets(array(1, 2), 2, 3, 2, 42L)")
        .collect()
    }
    assert(e.getMessage.contains("array<float>")
      || e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
