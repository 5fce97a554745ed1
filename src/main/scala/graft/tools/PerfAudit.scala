package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool backing the BASELINE.md heavy-tail audits: measures the
  * structural drivers of the suite's most expensive rows so their
  * cost is attributable to DATA SHAPE, not guessed at.
  *
  *  - `d06`: candidate-pair volume entering cluster formation (the
  *    d02 LSH pair stream), the distinct-node/edge counts after
  *    canonicalization, and the star-contraction round count.
  *  - `gr03 <cap>`: wedge volume and wall time of the triangle count
  *    at a given per-order fanout cap (the gr03 cost knob).
  *
  * Usage: runMain graft.tools.PerfAudit <sfDir> d06|gr03 [cap]
  */
object PerfAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val what = args(1)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    spark.sparkContext.setLogLevel("WARN")
    what match {
      case "d06" => d06(spark, sfDir)
      case "gr03" => gr03(spark, sfDir, args(2).toInt)
      case other => sys.error(s"unknown audit: $other")
    }
    spark.stop()
  }

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[audit] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  private def d06(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val pairs = timed("d02 pair generation (count)") {
      graft.queries.Dedup.dedupMinhashLsh(s, dir).cache()
    }
    println(s"[audit] d06 candidate pairs: ${pairs.count()}")
    val canon = pairs.select(
        greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    println(s"[audit] d06 distinct canonical edges: ${canon.count()}")
    println("[audit] d06 distinct nodes: " +
      pairs.select(col("a").as("n"))
        .unionAll(pairs.select(col("b").as("n"))).distinct().count())
    val t0 = System.nanoTime()
    val (labels, rounds) =
      graft.queries.Dedup.clusterPairsCounted(pairs)
    val n = labels.count()
    println(f"[audit] d06 star contraction: $rounds rounds, " +
      f"$n labels, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    pairs.unpersist()
  }

  private def gr03(s: SparkSession, dir: String, cap: Int): Unit = {
    val t0 = System.nanoTime()
    val n = graft.queries.Graph.trianglesWithCap(s, dir, cap).count()
    println(f"[audit] gr03 cap=$cap: $n nodes with triangles, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
