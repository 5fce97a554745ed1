package graft.tools

/** Dev tool backing the plans/r15 optimization evidence: writes the
  * `explain("formatted")` output of named SparkEntry queries to
  * `<outDir>/<name>_<suffix>.txt`, under the SAME production session
  * the bench uses (GraftSession: AQE + extensions), so the captured
  * plan is the one the driver actually times.
  *
  * Usage:
  *   runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> \
  *     <name1,name2,...>
  *
  * Note explain() prints the INITIAL adaptive plan
  * (isFinalPlan=false); join-strategy/exchange claims that only
  * materialize under AQE re-optimization are captured by executing
  * the query first and appending the final plan when it differs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.tools.ExplainDump <sfDir> <outDir> " +
          "<suffix> <name1,name2,...>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    // Queries that materialize internally (CacheScope) explain to a
    // bare checkpoint scan; these hooks expose the REAL inner plan
    // the materialization executes. "gr01_round" builds one pagerank
    // superstep lazily so the round's join strategy is visible —
    // pass spark.graft.superstep.broadcastRows=0 via SPARK_GRAFT_CAP0=1
    // to capture the pre-r15 shuffle shape.
    val inner: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "d13_inner" -> ((ss, d) =>
        graft.queries.Dedup.containmentDedupPlan(ss, d)._1),
      "gr01_round" -> ((ss, d) => {
        import org.apache.spark.sql.functions._
        if (sys.env.get("SPARK_GRAFT_CAP0").contains("1"))
          ss.conf.set("spark.graft.superstep.broadcastRows", "0")
        val e = graft.queries.Graph.edges(ss, d).persist()
        val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val withDeg = e.join(outdeg, "src").persist()
        val nodes = e.select(col("src").as("node")).distinct().persist()
        val nNodes = nodes.count()
        val ranks = nodes.select(col("node"), lit(1000000L).as("r"))
        val contrib = withDeg
          .join(graft.queries.Graph.maybeBroadcast(ranks, nNodes),
            col("src") === col("node"))
          .select(col("dst"), expr("85 * (r div outdeg) div 100").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("in_rank"))
        nodes.join(
          graft.queries.Graph.maybeBroadcast(contrib, nNodes),
          col("node") === col("dst"), "left")
          .select(col("node"), (lit(150000L) +
            coalesce(col("in_rank"), lit(0L))).as("r"))
      }))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = inner.getOrElse(name,
        qs.getOrElse(name, sys.error(s"unknown query: $name")))
      spark.sparkContext.setJobDescription(s"explain: $name")
      val df = fn(spark, sfDir)
      val initial = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // execute, then capture the AQE-final plan too
      df.count()
      val finalPlan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      val text = s"== $name ($suffix) ==\n\n$initial\n" +
        s"== AQE-final executed plan ==\n\n$finalPlan\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
