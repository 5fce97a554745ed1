package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for the integer dot product of two
  * `array<int>` columns — the kernel of the quantized-embedding
  * pipeline (d09 semantic dedup): exact 64-bit arithmetic, so results
  * are replayable in any engine (the whole point of int8 quantization
  * for oracle-checkable similarity). The composed
  * `aggregate(zip_with(...))` formulation allocates an intermediate
  * array per pair; over the quadratic in-cluster candidate set that
  * allocation dominates — this expression reads both unsafe arrays in
  * place and participates in whole-stage codegen. */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  // The kernel reads element bytes via getInt: without an input-type
  // check a SQL call on array<bigint>/array<float> would silently
  // misread memory — the analyzer must reject it instead.
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int_dot"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    IntDotProduct.kernel(x.asInstanceOf[ArrayData],
      y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = IntDotProduct.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (x, y) => s"$kernel.kernel($x, $y)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {

  /** Column-level API. */
  def intDot(x: Column, y: Column): Column =
    ColumnBridge.column(IntDotProduct(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Static kernel invoked from both interpreted eval and generated
    * code — single pass, no allocation, exact long arithmetic. */
  def kernel(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    dot
  }
}
