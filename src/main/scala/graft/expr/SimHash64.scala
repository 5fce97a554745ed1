package graft.expr

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression computing the 64-bit SimHash of a
  * space-tokenized string — the fingerprint kernel of near-duplicate
  * detection (reference: gecko's fingerprint-based dup detection; the
  * d03 corpus scan). Replaces the last corpus-wide ScalaUDF in the
  * dedup family: the UDF route deserializes every row to a JVM String
  * through the encoder boundary and blocks whole-stage codegen, while
  * this expression stays inside the generated loop via [[doGenCode]]
  * and reads the UTF8String payload directly.
  *
  * Hash family: two 32-bit MurmurHash3 string hashes (default seed +
  * 0x9747b28c) concatenated to 64 bits per word, sign-summed per bit,
  * majority-thresholded — identical bits to the original Scala
  * formulation, asserted by SimHashExprSpec. Values are
  * engine-internal — Hamming comparisons must use this same
  * expression on both sides. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  // The kernel reads the value as UTF8String: reject anything else at
  // analysis time rather than ClassCastException at run time.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          other.catalogString)
    }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = SimHash64.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.kernel($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {

  /** Column-level API. */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  /** Static kernel shared by interpreted eval and generated code.
    * Word split mirrors `String.split(' ')` (trailing empty tokens
    * dropped, "" yields one empty token) so the bits are identical to
    * the original `text.split(' ').foreach(...)` formulation. */
  def kernel(text: UTF8String): Long = {
    val words = text.toString.split(' ')
    val acc = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val h1 = MurmurHash3.stringHash(word).toLong & 0xffffffffL
      val h2 = MurmurHash3.stringHash(word, 0x9747b28c).toLong & 0xffffffffL
      val h = (h1 << 32) | h2
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
      w += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}
