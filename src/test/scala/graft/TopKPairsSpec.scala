package graft

import org.apache.spark.sql.functions._
import graft.expr.TopKPairs
import graft.queries.Relational

/** The bounded-heap exact top-k-per-group aggregate (q27). */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  test("q27 (heap aggregate) is row-identical to q07 (window rank)") {
    val viaHeap = Relational.q27TopkAgg(spark, sfDir).collect()
    val viaWindow = Relational.q07TopOrdersPerCustomer(spark, sfDir)
      .collect()
    assert(viaHeap.length == viaWindow.length && viaHeap.nonEmpty)
    viaHeap.zip(viaWindow).foreach { case (a, b) => assert(a == b) }
  }

  test("q27 plan: partial heap aggregate below the exchange, " +
    "no Window, no per-group sort") {
    val p = Relational.q27TopkAgg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_pairs"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Window"), "heap top-k must not plan a Window")
    // the only Sort allowed is the final presentation orderBy, which
    // sits ABOVE the aggregate — no sort below the exchange
    val belowAgg = p.substring(p.indexOf("ObjectHashAggregate"))
    assert(!belowAgg.contains("Sort"),
      "no group sort may appear below the aggregate")
  }

  test("merge-tree invariance: same result at 1, 3, and 32 " +
    "partitions, including duplicate-score tie-breaks") {
    // scores collide on purpose: tag asc must break ties everywhere
    val rows = (0L until 500L).map(i => (i % 7, (i % 13).toDouble, i))
    def run(parts: Int) =
      rows.toDF("g", "score", "tag").repartition(parts)
        .groupBy("g")
        .agg(TopKPairs.topkPairs(col("score"), col("tag"), 4).as("top"))
        .orderBy("g").collect()
        .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)))
    val one = run(1)
    assert(one.forall(_._2.length == 4))
    // best-first within each group: score desc, tag asc on equal score
    one.foreach { case (_, top) =>
      top.sliding(2).foreach { case Seq(a, b) =>
        val (sa, ta) = (a.getDouble(0), a.getLong(1))
        val (sb, tb) = (b.getDouble(0), b.getLong(1))
        assert(sa > sb || (sa == sb && ta < tb), s"$a !>= $b")
      case _ => }
    }
    assert(run(3).toSeq == one.toSeq)
    assert(run(32).toSeq == one.toSeq)
  }

  test("sql surface: topk_pairs registered and exact") {
    GraftExtensions.register(spark)
    Seq((1L, 2.0, 10L), (1L, 5.0, 11L), (1L, 5.0, 9L), (1L, 1.0, 8L))
      .toDF("g", "s", "t").createOrReplaceTempView("tk_in")
    val out = spark.sql(
      "SELECT topk_pairs(s, t, 2) AS top FROM tk_in GROUP BY g")
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((5.0, 9L), (5.0, 11L)))
  }

  test("analysis-time rejection of mistyped input") {
    val df = Seq((1L, "x", 2L)).toDF("g", "s", "t")
    intercept[Exception] {
      df.groupBy("g")
        .agg(TopKPairs.topkPairs(col("s"), col("t"), 2)).collect()
    }
  }
}
