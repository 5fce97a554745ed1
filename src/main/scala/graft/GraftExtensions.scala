package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import graft.expr.MinHashSignature

/** SQL-surface registration for the engine's custom expressions.
  *
  * Cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (applied at session construction). For an already-running session —
  * tests, notebooks — call [[GraftExtensions.register]] directly. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.minhashSignatureFn)
  }
}

object GraftExtensions {

  private def buildMinhash(exprs: Seq[Expression]): Expression = {
    val k = exprs.lift(1) match {
      case Some(Literal(v: Int, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"minhash_signature: k must be an integer literal, got $other")
      case None => 32
    }
    MinHashSignature(exprs.head, k)
  }

  private[graft] val minhashSignatureFn = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName,
      "minhash_signature"),
    (exprs: Seq[Expression]) => buildMinhash(exprs))

  /** Register the engine's SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", buildMinhash, "scala_udf")
}
