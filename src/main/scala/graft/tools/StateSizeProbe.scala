package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measurement harness for the st30 streamed-dedup scale questions
  * the r11 verdict asked about: RocksDB state size and per-batch time
  * growth across SFs. Runs the exact st30 pipeline (same staged
  * `doc_id % 7` epoch source, same [[graft.queries.Streaming
  * .runLshEpoch]] machinery, RocksDB + changelog checkpointing) over
  * the given sf dir, records every micro-batch's duration and input
  * rows through a StreamingQueryListener, then sizes the checkpoint's
  * state directory on disk.
  *
  * Usage: runMain graft.tools.StateSizeProbe <sfDir>
  * Prints one JSON line:
  *   {"sf":…,"total_sec":…,"state_bytes":…,"ckpt_bytes":…,
  *    "n_docs":…,"batches":[{"id":…,"sec":…,"rows":…},…]}
  */
object StateSizeProbe {
  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = graft.GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0)
          batches.add((p.batchId,
            p.durationMs.getOrDefault("triggerExecution", 0L) / 1e3,
            p.numInputRows))
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val src = graft.queries.Streaming.lshDocSrc(spark, sfDir)
    val nDocs = spark.read.parquet(src).count()
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_stprobe_${spark.sparkContext.applicationId}")
    val t0 = System.nanoTime()
    graft.queries.Streaming.runLshEpoch(spark,
      src, s"$base/out", s"$base/ckpt")
    val totalSec = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)

    val stateBytes = dirBytes(new java.io.File(s"$base/ckpt/state"))
    val ckptBytes = dirBytes(new java.io.File(s"$base/ckpt"))
    val bs = batches.toArray(Array.empty[(Long, Double, Long)])
      .sortBy(_._1)
      .map { case (id, sec, rows) =>
        f"""{"id":$id,"sec":$sec%.2f,"rows":$rows}""" }
      .mkString("[", ",", "]")
    println(
      f"""{"sf":"$sfDir","total_sec":$totalSec%.2f,""" +
        s""""state_bytes":$stateBytes,"ckpt_bytes":$ckptBytes,""" +
        s""""n_docs":$nDocs,"batches":$bs}""")
    spark.stop()
  }
}
