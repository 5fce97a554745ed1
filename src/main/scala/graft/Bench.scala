package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, writes the metrics JSON to bench.json (in
  * SPARK_GRAFT_OUT, or the working dir) and prints it as the final
  * stdout line — the file is the canonical machine-readable artifact;
  * the stdout line is a fallback for line-grepping drivers. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the actual core count — a hardcoded local[32] silently
    // oversubscribes smaller machines and skews timings
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
      .max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warmup so the first measured query doesn't pay codegen +
    // datasource init (~3s); touches every table's footer too
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // warm the mutator p-protocol path (stats agg + when()-fold codegen:
    // the first stats-bearing mutator query otherwise pays ~2s of
    // one-time janino/JIT compilation — measured as the r1 m13 outlier)
    locally {
      import org.apache.spark.sql.functions.col
      // 'A'-prefixed values keep the lowercase mutator's eligibility
      // non-zero — digits-only values would fire a spurious p-unmet
      // warning during warmup
      val tiny = spark.range(100)
        .selectExpr("id as __row_id", "concat('A', id) as v")
      graft.mut.Mutators.WithLowercase(seed = 1)(
        tiny, Seq("v"), 0.5, col("__row_id")).count()
      ()
    }

    // n iterations per query, report the per-query MIN: single-shot
    // numbers at sub-second scale are dominated by JIT/janino warmup
    // and run-order noise (the r2 m15/m05 "regressions" were exactly
    // that), and min-of-n is the standard steady-state estimator
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              -1.0
          }
        }
        // any failed iteration poisons the query: report -1, never a
        // (fast) partial success
        name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","cpus":$cpus,"iters":$iters}"""

    // file first: survives any stdout interleaving from sbt/Spark
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT", ".")
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, "bench.json"),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write bench.json: ${e.getMessage}")
    }

    // stop Spark BEFORE the JSON line so no executor-shutdown noise
    // lands after it — the JSON must be the last line on stdout
    spark.stop()
    System.out.flush()
    println(json)
    System.out.flush()
  }
}
