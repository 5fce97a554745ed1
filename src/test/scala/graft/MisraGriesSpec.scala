package graft

import org.apache.spark.sql.functions._

/** Contracts of the [[graft.expr.MisraGriesTopK]] custom aggregate
  * (the TypedImperativeAggregate extension surface): exactness when
  * nothing is evicted, the frequency guarantee under every
  * partitioning (i.e. under different partial/merge trees), and the
  * SQL registration. */
class MisraGriesSpec extends SparkSpec {
  import graft.expr.MisraGriesTopK.mgTopK

  // the t22 stream (corpus tokens + planted hot token) so the recall
  // clause of the guarantee is non-vacuous: zzz_hot is above the
  // N/(k+1) threshold by construction, nothing organic is
  private def tokenStream(nParts: Int) =
    queries.TextAnalysis.heavyTokenStream(spark, sfDir)
      .repartition(nParts)

  test("no-eviction regime: k >= distinct tokens => exact counts, " +
    "zero error, independent of partitioning") {
    import spark.implicits._
    val data = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
    for (nParts <- Seq(1, 3, 7)) {
      val out = data.toDF("t").repartition(nParts)
        .agg(mgTopK(col("t"), 10).as("s"))
        .select(explode(col("s")).as("hh"))
        .select(col("hh.token"), col("hh.est"), col("hh.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(out == Set(("a", 5L, 0L), ("b", 3L, 0L), ("c", 1L, 0L)),
        s"nParts=$nParts got $out")
    }
  }

  test("guarantee regime on the corpus token stream: every token " +
    "with true count > N/(k+1) is tracked and true is in " +
    "[est, est+err] — under three different merge trees") {
    val k = 8 // below the corpus vocabulary size => real evictions
    val exact = tokenStream(1).groupBy("token")
      .agg(count(lit(1)).as("true_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (nParts <- Seq(1, 4, 13)) {
      val sketch = tokenStream(nParts)
        .agg(mgTopK(col("token"), k).as("s"))
        .select(explode(col("s")).as("hh"))
        .select(col("hh.token"), col("hh.est"), col("hh.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(sketch.length <= k)
      val tracked = sketch.map(_._1).toSet
      val heavy = exact.filter { case (_, c) => c * (k + 1) > n }.keys
      assert(heavy.nonEmpty, "plant failed: no heavy token exists")
      val missedHeavy = heavy.filterNot(tracked)
      assert(missedHeavy.isEmpty,
        s"nParts=$nParts missed heavy tokens: $missedHeavy")
      sketch.foreach { case (t, est, err) =>
        val truth = exact(t)
        assert(est <= truth && truth <= est + err,
          s"nParts=$nParts token=$t est=$est err=$err true=$truth")
      }
    }
  }

  test("sql surface: mg_topk registered; exact in the no-eviction " +
    "regime through SQL too") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq("x", "x", "y").toDF("t").createOrReplaceTempView("mg_in")
    val out = spark.sql(
      "SELECT explode(mg_topk(t, 8)) AS hh FROM mg_in")
      .select("hh.token", "hh.est").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("x", 2L), ("y", 1L)))
  }

  test("analysis-time rejection of non-string input") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT mg_topk(a, 4) FROM VALUES (1), (2) AS t(a)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
