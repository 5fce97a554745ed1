package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool for the r15-opt a03 audit: splits the 100M-row
  * generate+mutate row into (generation, +mutators incl. the fused
  * stats pass, +final contract agg) and A/Bs cacheForStats, so the
  * optimization targets the measured phase.
  *
  * Usage: runMain graft.tools.A03Probe <sfDir> [rows] [iters]
  */
object A03Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rows = if (args.length > 1) args(1).toLong else 100000000L
    val iters = if (args.length > 2) args(2).toInt else 2
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    s.sparkContext.setLogLevel("WARN")
    s.range(1000).selectExpr("sum(id)").collect()
    s.read.parquet(s"$sfDir/customer.parquet").count()

    def timed(label: String)(f: => Any): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[a03] $label: min ${times.min}%.2f s")
    }

    timed(s"generate($rows).agg(count)") {
      graft.queries.LayerADemo.benchGenerate(s, sfDir, rows)
        .agg(count(lit(1))).collect()
    }
    timed(s"generate($rows) noop sink (all columns)") {
      graft.queries.LayerADemo.benchGenerate(s, sfDir, rows)
        .write.format("noop").mode("overwrite").save()
    }
    timed(s"mutate($rows).agg(count) (gen + fused stats + mutators)") {
      graft.queries.LayerADemo.benchMutate(s, sfDir, rows)
        .agg(count(lit(1))).collect()
    }
    timed(s"full a03($rows) (with the contract regex agg)") {
      graft.queries.LayerADemo.bench100mGenerateMutateAt(s, sfDir, rows)
        .collect()
    }
    s.stop()
  }
}
