package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool for the r15-opt graph-family audit: splits gr01's wall
  * time into (edge build, per-round superstep, final sort) so the
  * optimization targets the measured phase, not a guess. Each phase
  * is timed over a count() of its materialized frame, under the same
  * production session the bench uses.
  *
  * Usage: runMain graft.tools.GraphProbe <sfDir> [iters]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 2
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    s.sparkContext.setLogLevel("WARN")
    // warmup (codegen + datasource init, the Bench discipline)
    s.range(1000).selectExpr("sum(id)").collect()
    s.read.parquet(s"$sfDir/lineitem.parquet").count()
    s.read.parquet(s"$sfDir/orders.parquet").count()

    def timed(label: String)(f: => Long): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $label: min ${times.map(_._1).min}%.2f s " +
        f"(rows ${times.head._2})")
    }

    timed("full gr01 (bench row)") {
      graft.queries.Graph.pagerank(s, sfDir).count()
    }
    // phase split
    val pairs = graft.queries.Relational.table(s, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.queries.Relational.table(s, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("supp"),
        (col("o_custkey") + 100000L).as("cust"))
      .distinct()
    val e = pairs.select(col("supp").as("src"), col("cust").as("dst"))
      .union(pairs.select(col("cust").as("src"), col("supp").as("dst")))
    timed("edge build (join+distinct+union, count)") { e.count() }
    val ep = e.persist()
    timed("edge persist materialize") { ep.count() }
    val outdeg = ep.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = ep.join(outdeg, "src").persist()
    timed("withDeg persist") { withDeg.count() }
    val nodes = ep.select(col("src").as("node")).distinct().persist()
    timed("nodes persist") { nodes.count() }
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
      .localCheckpoint()
    (1 to 3).foreach { i =>
      timed(s"round $i (join+agg+left+checkpoint)") {
        val contrib = withDeg
          .join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("85 * (r div outdeg) div 100").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("in_rank"))
        ranks = nodes
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("in_rank"), lit(0L))).as("r"))
          .localCheckpoint()
        ranks.count()
      }
    }
    timed("final orderBy readout") { ranks.orderBy("node").count() }
    s.stop()
  }
}
