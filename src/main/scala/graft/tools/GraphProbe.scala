package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool for the r15-opt graph-family audit.
  *
  * `phase` mode splits gr01's wall time into (edge build, per-round
  * superstep, final sort) so the optimization targets the measured
  * phase, not a guess.
  *
  * `ab` mode A/B-times the superstep broadcast decision INTERLEAVED
  * in one JVM (old shuffle shape via
  * spark.graft.superstep.broadcastRows=0, new measured-count
  * broadcast shape via the default cap), which cancels the ambient
  * drift that made independent subset runs of these sub-5 s rows
  * uninterpretable (±80% observed between identical runs).
  *
  * Usage:
  *   runMain graft.tools.GraphProbe <sfDir> phase [iters]
  *   runMain graft.tools.GraphProbe <sfDir> ab [iters]
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = if (args.length > 1) args(1) else "phase"
    val iters = if (args.length > 2) args(2).toInt else 3
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    s.sparkContext.setLogLevel("WARN")
    // warmup (codegen + datasource init, the Bench discipline)
    s.range(1000).selectExpr("sum(id)").collect()
    s.read.parquet(s"$sfDir/lineitem.parquet").count()
    s.read.parquet(s"$sfDir/orders.parquet").count()
    if (mode == "ab") ab(s, sfDir, iters) else phase(s, sfDir, iters)
    s.stop()
  }

  private def ab(s: org.apache.spark.sql.SparkSession, sfDir: String,
      iters: Int): Unit = {
    val Cap = "spark.graft.superstep.broadcastRows"
    val rows = Seq[(String, () => Long)](
      "gr01_pagerank" ->
        (() => graft.queries.Graph.pagerank(s, sfDir).count()),
      "gr04_dense_core" ->
        (() => graft.queries.Graph.denseCore(s, sfDir).count()),
      "gr06_bfs_hops" ->
        (() => graft.queries.Graph.bfsHops(s, sfDir).count()),
      "gr07_personalized_pagerank" ->
        (() => graft.queries.Graph.personalizedPagerank(s, sfDir).count()),
      "gr08_weighted_paths" ->
        (() => graft.queries.Graph.weightedPaths(s, sfDir).count()))
    rows.foreach { case (name, f) =>
      f() // warm this row's codegen under the default (new) shape
      val (olds, news) = (1 to iters).map { _ =>
        s.conf.set(Cap, "0")
        val t0 = System.nanoTime(); f()
        val tOld = (System.nanoTime() - t0) / 1e9
        s.conf.set(Cap, "2000000")
        val t1 = System.nanoTime(); f()
        val tNew = (System.nanoTime() - t1) / 1e9
        (tOld, tNew)
      }.unzip
      s.conf.unset(Cap)
      println(f"[ab] $name: shuffle-shape min ${olds.min}%.2f s, " +
        f"broadcast-shape min ${news.min}%.2f s " +
        f"(all: old ${olds.map(t => f"$t%.2f").mkString("/")} " +
        f"new ${news.map(t => f"$t%.2f").mkString("/")})")
    }
  }

  private def phase(s: org.apache.spark.sql.SparkSession, sfDir: String,
      iters: Int): Unit = {
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
    // phase split (OLD shuffle shape, inline)
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
  }
}
