package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType,
  IntegerType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression encoding an embedding into its product-
  * quantization code — the corpus-wide pass of the PQ ANN index build
  * (s10). Unlike the seeded expressions ([[HyperplaneBuckets]],
  * [[MinHashSignature]]), the codebooks here are TRAINED state, so the
  * expression carries them as a field and generated code receives them
  * through `ctx.addReferenceObj` — the Catalyst pattern for shipping
  * model parameters into whole-stage codegen (how Spark's own
  * ML-adjacent expressions embed driver-built objects). Per-subspace
  * nearest-centroid math is bit-identical to
  * [[graft.queries.Similarity.pqNearest]] (spec-checked). */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEncode.kernel(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks,
      "float[][][]")
    val kernel = PqEncode.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.kernel($c, $cbRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

object PqEncode {

  /** Column-level API. */
  def pqEncode(c: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c), codebooks))

  /** Static kernel invoked from interpreted eval and generated code:
    * per subspace, the squared-L2-nearest codebook entry (ties →
    * lowest index), reading the unsafe float array in place. */
  def kernel(v: ArrayData, cbs: Array[Array[Array[Float]]]): ArrayData = {
    val m = cbs.length
    val n = v.numElements()
    val out = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cents = cbs(s)
      val sub = cents(0).length
      // clamp like a Scala slice: a short vector contributes only its
      // available dims (parity with Similarity.pqEncode)
      val lim = math.min(sub, math.max(0, n - off))
      var best = 0
      var bd = Double.MaxValue
      var i = 0
      while (i < cents.length) {
        val c = cents(i)
        var d = 0.0
        var j = 0
        while (j < lim) {
          val t = v.getFloat(off + j).toDouble - c(j)
          d += t * t
          j += 1
        }
        if (d < bd) { bd = d; best = i }
        i += 1
      }
      out(s) = best
      off += sub
      s += 1
    }
    new GenericArrayData(out)
  }
}
