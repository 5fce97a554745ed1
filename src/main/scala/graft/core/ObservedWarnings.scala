package graft.core

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** `observe()`-based delivery of data-dependent engine warnings.
  *
  * The eager p-protocol warnings (eligibility known before the rewrite)
  * fire at plan time from the fused stats pass; warnings that depend on
  * the REWRITTEN data — e.g. M15's "wraparound reverted selected rows so
  * the realized p fell short" (reference: gecko/mutator.py:1284-1289) —
  * would need a second full scan of the result. Instead the counts ride
  * the caller's next action as named `observe()` metrics (computed
  * map-side inside whole-stage codegen, merged on the driver, zero
  * extra jobs) and a [[QueryExecutionListener]] turns them into
  * [[Warnings]] entries when the action completes. This is also the
  * scale-safe replacement for driver-eager metric collection in
  * general: at 100 TB an extra metrics scan is a real cost; an observe
  * metric is free.
  *
  * Listener callbacks are asynchronous (Spark delivers them on the
  * listener bus), so warnings surface shortly after the action returns;
  * tests poll [[Warnings.drain]].
  */
object ObservedWarnings {
  private class Pending(val fnName: String, val p: Double) {
    /** Largest row count any completed action has scanned — a partial
      * action (show(5)/limit) early-terminates the scan, so its metrics
      * cover only a sample; only a new high-water scan refines the
      * estimate. */
    var maxTotal: Long = -1L
    /** Last realized rate warned about, for message-level dedup. */
    var warnedRate: Double = Double.NaN
  }

  private val MaxPending = 1024
  // Entries live until evicted: delivery must NOT consume them, because
  // the first action is often a partial scan (show) whose metrics are
  // meaningless; a later full-scan action supersedes it. The map is
  // insertion-order bounded so plans that are built but never executed
  // (speculative construction in a long-lived driver) can't leak —
  // each entry is only meaningful for its plan's next few actions.
  private val pending =
    new java.util.LinkedHashMap[String, Pending](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Pending]): Boolean =
        size() > MaxPending
    }
  // weak keys — don't pin stopped sessions in memory
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  private val counter = new AtomicLong()

  /** Attach revert-tracking metrics to `df`: when the next action on
    * (a descendant of) `df` completes and any selected row was
    * reverted, a p-unmet warning with the realized rate is queued. */
  def observeRevert(df: DataFrame, fnName: String, p: Double,
                    reverted: Column, selected: Column): DataFrame = {
    val metricName = s"gecko_p_unmet_${counter.incrementAndGet()}"
    pending.synchronized {
      pending.put(metricName, new Pending(fnName, p)); ()
    }
    ensureListener(df.sparkSession)
    df.observe(metricName,
      sum(reverted.cast("long")).as("n_reverted"),
      sum(selected.cast("long")).as("n_selected"),
      count(lit(1)).as("n_total"))
  }

  private def ensureListener(session: SparkSession): Unit =
    if (registered.add(session)) {
      session.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit =
          // other operators use observe() too (e.g. cluster-formation
          // convergence metrics) — touching their rows here throws
          // FIELD_NOT_FOUND and silently aborts the remaining metrics
          // of the same query, so gate on OUR metric-name prefix first
          qe.observedMetrics
            .filter { case (mName, _) =>
              mName.startsWith("gecko_p_unmet_") }
            .foreach { case (mName, row) =>
            def metric(field: String): Long = {
              val i = row.fieldIndex(field)
              if (row.isNullAt(i)) 0L else row.getLong(i)
            }
            val nReverted = metric("n_reverted")
            val nSelected = metric("n_selected")
            val nTotal = metric("n_total")
            pending.synchronized {
              val info = pending.get(mName)
              // only a scan at least as complete as any seen so far can
              // refine the estimate — a limit/show after a full action
              // must not regress it, and the very first full action
              // after a 5-row show() must still deliver the real
              // shortfall (so delivery does NOT consume the entry)
              if (info != null && nTotal > 0 && nTotal >= info.maxTotal) {
                info.maxTotal = nTotal
                // reference semantics (mutator.py:1284-1289): warn only
                // when a selected row actually failed to mutate; dedup
                // at message level so re-running the same action never
                // replays the identical warning
                val realized = (nSelected - nReverted).toDouble / nTotal
                if (nReverted > 0 && realized != info.warnedRate) {
                  info.warnedRate = realized
                  Warnings.warnP(info.fnName, info.p, realized)
                }
              }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
      ()
    }
}
