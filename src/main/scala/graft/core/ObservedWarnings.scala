package graft.core

import java.util.concurrent.ConcurrentHashMap
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
  private case class Pending(fnName: String, p: Double)
  private val pending = new ConcurrentHashMap[String, Pending]()
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
    pending.put(metricName, Pending(fnName, p))
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
          qe.observedMetrics.foreach { case (mName, row) =>
            // remove-on-delivery: one warning per mutate call (as the
            // reference warns once), even if the caller runs several
            // actions on the same result — and no unbounded pending map
            val info = pending.remove(mName)
            if (info != null) {
              def metric(field: String): Long = {
                val i = row.fieldIndex(field)
                if (row.isNullAt(i)) 0L else row.getLong(i)
              }
              val nReverted = metric("n_reverted")
              val nTotal = metric("n_total")
              // reference semantics (mutator.py:1284-1289): warn only
              // when a selected row actually failed to mutate
              if (nTotal > 0 && nReverted > 0)
                Warnings.warnP(info.fnName, info.p,
                  (metric("n_selected") - nReverted).toDouble / nTotal)
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      })
      ()
    }
}
