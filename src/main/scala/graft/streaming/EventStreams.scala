package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Streaming surface over the events table (absent in the reference —
  * SURVEY.md §2.4 streaming row; Layer B). Transformations are written
  * against plain DataFrames so the SAME code runs in batch (driver
  * correctness gate, DuckDB oracle) and under Structured Streaming
  * (readStream → writeStream, exercised in StreamingSpec with a memory
  * sink): Catalyst plans the incremental execution, state store and
  * watermark-based late-data handling. */
object EventStreams {

  val EventsSchema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
    "event_type STRING, value DOUBLE, props STRING"

  /** Tumbling (or sliding, when slide != duration) window aggregation
    * with a watermark. Works on batch and streaming inputs alike. */
  def windowedAgg(events: DataFrame, duration: String, slide: String,
                  watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("w_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Batch sessionization: a session closes after `gapMinutes` of user
    * inactivity. Classic lag + running-sum-of-boundaries formulation —
    * one shuffle on user_id, everything else window functions. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(byUser)
    // millisecond precision, matching sessionizeStream's getTime-based
    // gap comparison (unix_timestamp would truncate to seconds and
    // disagree on sub-second boundaries)
    val isNew = when(prevTs.isNull ||
      unix_millis(col("ts")) - unix_millis(prevTs) >
        gapMinutes * 60000L, 1L).otherwise(0L)
    events
      .withColumn("session_no",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("total_value"))
  }

  /** At-least-once → effectively-once: drop replayed events by id,
    * keeping dedup state only within the watermark horizon (state is
    * bounded — the 100 TB-stream-safe shape; a plain dropDuplicates
    * would grow state forever). Batch callers get ordinary
    * dropDuplicates semantics from the same call site. */
  def dedupEvents(events: DataFrame, watermark: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Stream-stream attribution join: each purchase paired with the
    * same user's clicks in the preceding `windowMinutes`. The identical
    * join predicate runs in batch and in Structured Streaming — in
    * streaming, the event-time range condition plus per-input
    * watermarks let Spark expire click state older than
    * watermark − interval, so join state stays bounded no matter how
    * long the streams run (inner-join results still emit eagerly). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int, watermark: String): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val c = wm(clicks).select(col("user_id").as("c_user"),
      col("ts").as("c_ts"), col("value").as("c_value"))
    val p = wm(purchases).select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user"), col("ts").as("p_ts"))
    p.join(c,
      col("c_user") === col("p_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") -
          expr(s"INTERVAL '$windowMinutes' MINUTE"))
  }

  // ---------------- streaming sessionization (stateful) ----------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     n_events: Long, total_value: Double)

  /** Streaming sessionization via flatMapGroupsWithState: one state
    * entry per user, sessions emitted on gap timeout. State size is
    * O(active users) — the scale-safe shape for unbounded streams. */
  def sessionizeStream(events: Dataset[Event],
                       gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var st = state.getOption.orNull
          // process events in time order within the batch
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 1, e.value)
            else if (t - st.lastTs > gapMs) {
              out += Session(userId, new java.sql.Timestamp(st.start),
                st.n, st.total)
              st = SessionState(t, t, 1, e.value)
            } else st = st.copy(lastTs = t, n = st.n + 1,
              total = st.total + e.value)
          }
          if (state.hasTimedOut && st != null) {
            out += Session(userId, new java.sql.Timestamp(st.start),
              st.n, st.total)
            st = null
          }
          if (st != null) {
            state.update(st)
            state.setTimeoutTimestamp(st.lastTs + gapMs)
          } else state.remove()
          out.iterator
      }
  }
}
