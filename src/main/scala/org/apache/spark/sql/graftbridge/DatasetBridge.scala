package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Spark 4 keeps `Dataset.ofRows` (plan → DataFrame) and the analyzed
  * plan of a DataFrame behind `private[sql]`/classic types. Custom
  * logical operators need both: deconstruct the inputs into plans,
  * wrap them in the custom node, and re-wrap the node as a DataFrame.
  * This bridge (sql package namespace, same technique as
  * [[ColumnBridge]]) re-exports exactly those two hooks. */
object DatasetBridge {

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan as a DataFrame on the given session. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `SparkSession.cloneSession()` — same SparkContext and cached
    * data, fresh copy of the SessionState (conf, catalog, registry).
    * `private[sql]` in Spark 4; needed to run CONCURRENT streaming
    * queries without contending on one session's analyzer state and
    * to scope per-stream conf overrides. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()
}
