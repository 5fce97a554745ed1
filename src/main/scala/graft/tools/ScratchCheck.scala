package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway local runner for spot-checking individual queries. */
object ScratchCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.filter(kv => names.contains(kv._1)).foreach {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (sys.env.contains("GRAFT_EXPLAIN")) {
          println(s"==== $name ====")
          df.explain("formatted")
        } else df.show(20, truncate = false)
        println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
