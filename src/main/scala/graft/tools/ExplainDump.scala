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
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown query: $name"))
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
