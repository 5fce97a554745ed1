package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, ExpiredTimerInfo, Trigger}

/** Throwaway probe for Spark's event-time timer semantics:
  *  (a) comparator — does a timer at exactly the final watermark fire?
  *  (b) does Trigger.AvailableNow run a trailing no-data batch so
  *      timers registered in the last data batch can fire at all?
  * Feeds ms-aligned events so the watermark arithmetic is exact.
  */
object TimerProbe {
  case class In(ts: java.sql.Timestamp, user_id: Long)
  case class Fired(user_id: Long, expiry_ms: Long, wm_ms: Long)

  class Probe(timerAtMs: Map[Long, Long])
      extends StatefulProcessor[Long, In, Fired] {
    override def init(o: OutputMode, t: TimeMode): Unit = ()
    override def handleInputRows(key: Long, rows: Iterator[In],
        timers: TimerValues): Iterator[Fired] = {
      rows.foreach(_ => ())
      getHandle.registerTimer(timerAtMs(key))
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[Fired] =
      Iterator.single(Fired(key, info.getExpiryTimeInMs,
        timers.getCurrentWatermarkInMs()))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("timerprobe")
    val src = s"$base/src"
    // data batch 1: three users' single events at t=1000s; timers are
    // registered relative to the final watermark (see below)
    // data batch 2: a watermark driver at t=2000s
    //   final watermark after batch 2 = 2_000_000ms - 10_000ms (delay)
    //   = 1_990_000 ms
    val wmFinal = 2000000L - 10000L
    val t1 = Seq(In(new java.sql.Timestamp(1000000L), 1L),
      In(new java.sql.Timestamp(1000000L), 2L),
      In(new java.sql.Timestamp(1000000L), 3L))
    // sub-ms max event time: 2,000,000.999 ms — if the watermark
    // FLOORS micros->ms the final watermark stays 1,990,000; if it
    // rounded, it would be 1,990,001 and user 3 would fire
    val t2ts = new java.sql.Timestamp(2000000L)
    t2ts.setNanos(999000)
    val t2 = Seq(In(t2ts, 99L))
    t1.toDS().coalesce(1).write.parquet(s"$src/f0")
    t2.toDS().coalesce(1).write.parquet(s"$src/f1")
    new java.io.File(s"$src/f0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(_.setLastModified(1700000000000L))
    new java.io.File(s"$src/f1").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(_.setLastModified(1700000060000L))
    // flatten: move part files up as week-style single files
    val flat = s"$base/flat"
    new java.io.File(flat).mkdirs()
    Seq("f0", "f1").zipWithIndex.foreach { case (d, i) =>
      val part = new java.io.File(s"$src/$d").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(flat, f"in-$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + i * 60000L)
    }

    // user 1: timer exactly AT the final watermark
    // user 2: timer 1ms BELOW it   user 3: timer 1ms ABOVE it
    val timerAt = Map(1L -> wmFinal, 2L -> (wmFinal - 1), 3L -> (wmFinal + 1),
      99L -> (wmFinal + 1000000L))
    val stream = spark.readStream
      .schema(Encoders.product[In].schema)
      .option("maxFilesPerTrigger", "1").parquet(flat)
      .as[In]
      .withWatermark("ts", "10 seconds")
      .groupByKey(_.user_id)
      .transformWithState(new Probe(timerAt), TimeMode.EventTime(),
        OutputMode.Append())
    val q = stream.writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fired = spark.read.parquet(s"$base/out").as[Fired].collect()
      .sortBy(_.user_id)
    println(s"FINAL-WM(expected)=$wmFinal")
    fired.foreach(f => println(
      s"FIRED user=${f.user_id} expiry=${f.expiry_ms} wm=${f.wm_ms}"))
    val firedSet = fired.map(_.user_id).toSet
    println(s"at-watermark fires: ${firedSet.contains(1L)}; " +
      s"below fires: ${firedSet.contains(2L)}; " +
      s"above fires: ${firedSet.contains(3L)}")
    spark.stop()
  }
}
