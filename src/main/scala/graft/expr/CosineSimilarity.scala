package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the re-rank kernel of every ANN / embedding
  * near-dup path (s01/s02/s04/d05). A Scala UDF pays a
  * catalyst→Seq[Float] conversion per row per side; at 100 TB the
  * re-rank runs over every candidate pair, so the boxing is pure
  * overhead. This expression reads the unsafe array data in place and
  * participates in whole-stage codegen via [[doGenCode]].
  *
  * The arithmetic (double accumulation, left operand widened first,
  * zero-norm guard) matches graft.queries.Similarity.cosine exactly, so
  * swapping the UDF for this expression is bit-compatible with the
  * established oracles. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    CosineSimilarity.kernel(x.asInstanceOf[ArrayData],
      y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = CosineSimilarity.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (x, y) => s"$kernel.kernel($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Column-level API. */
  def cosineSimilarity(x: Column, y: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Static kernel invoked from both interpreted eval and generated
    * code — single pass, no allocation. */
  def kernel(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0 || ny == 0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
}
