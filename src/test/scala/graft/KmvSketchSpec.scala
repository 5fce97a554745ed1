package graft

import org.apache.spark.sql.functions._

/** SQL-surface and merge contracts of [[graft.expr.KmvSketchAgg]] —
  * closing the third TypedImperativeAggregate's registration gap
  * (mg_topk and topk_pairs have their own SQL-surface specs). */
class KmvSketchSpec extends SparkSpec {
  import graft.expr.KmvSketchAgg

  test("sql surface: SELECT kmv_sketch(x, 256) works in spark.sql, " +
    "exact below capacity, and matches the column API bit-for-bit") {
    GraftExtensions.register(spark)
    spark.range(1000)
      .select(xxhash64(col("id")).as("h"))
      .createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT kmv_sketch(h, 256) AS sk FROM kmv_in")
      .collect().head.getSeq[Long](0)
    // 256 mins of 1000 distinct hashes: full, sorted, deterministic
    assert(viaSql.length == 256)
    assert(viaSql == viaSql.sorted)
    val viaColumn = spark.table("kmv_in")
      .agg(KmvSketchAgg.kmvSketch(col("h"), 256).as("sk"))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaColumn)
    // below capacity the sketch IS the distinct set => estimate exact
    val small = spark.sql("SELECT kmv_sketch(h, 256) AS sk FROM " +
      "(SELECT * FROM kmv_in LIMIT 100)")
      .collect().head.getSeq[Long](0)
    assert(small.length == 100)
    assert(KmvSketchAgg.estimateDistinct(small.toArray, 256) == 100.0)
  }

  test("sql surface: sketch is partitioning-invariant (set semantics " +
    "across any partial/merge tree)") {
    GraftExtensions.register(spark)
    val sketches = Seq(1, 4, 13).map { nParts =>
      spark.range(5000)
        .repartition(nParts)
        .select(xxhash64(col("id")).as("h"))
        .createOrReplaceTempView("kmv_parts")
      spark.sql("SELECT kmv_sketch(h, 64) AS sk FROM kmv_parts")
        .collect().head.getSeq[Long](0)
    }
    assert(sketches.distinct.size == 1,
      s"sketch differs across partitionings: ${sketches.map(_.take(3))}")
  }

  test("analysis-time rejection: non-bigint input and non-literal k") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(a, 4) FROM VALUES ('x'), ('y') AS t(a)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(h, h) FROM " +
        "(SELECT CAST(1 AS BIGINT) AS h)").collect()
    }
    assert(e2.getMessage.contains("literal"), e2.getMessage)
  }
}
