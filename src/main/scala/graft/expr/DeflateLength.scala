package graft.expr

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, NullType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression computing the RAW-DEFLATE compressed
  * length of a string's UTF-8 bytes — the kernel of the
  * compression-ratio quality signal (Gopher-style corpus curation:
  * near-incompressible text is usually binary/garbage, hyper-
  * compressible text is boilerplate or degenerate repetition; both
  * tails get filtered before pretraining).
  *
  * A compression pass is the classic "must be a UDF" case — it is
  * byte-level imperative work over the whole corpus — which is exactly
  * why it is an `Expression` here: the UDF route would deserialize
  * every row through the encoder boundary and break the enclosing
  * whole-stage-codegen span, while this kernel reads the UTF8String
  * payload directly inside the generated loop. The `Deflater` is
  * JNI-backed and allocation-heavy, so one instance is pooled per
  * thread and `reset()` between rows (the documented reuse protocol).
  *
  * Determinism: fixed level (6), fixed strategy (default), `nowrap`
  * raw stream — byte-identical output for identical input within one
  * zlib build, and the LENGTH (all this expression exposes) is what
  * the quality signal consumes. Values are engine-internal → gate
  * queries built on it are rows-only with an oracle-checked invariant
  * companion (t40). */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          other.catalogString)
    }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_length"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLength.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = DeflateLength.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.kernel($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLength = copy(child = newChild)
}

object DeflateLength {

  /** Column-level API. */
  def deflateLength(c: Column): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(c)))

  /** One Deflater per executor thread, `reset()` per row: `Deflater`
    * holds native zlib state whose allocation dwarfs small-document
    * compression itself; `end()` is intentionally never called — the
    * instance lives as long as the task thread and the native buffers
    * are bounded (one dictionary window per thread). */
  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(6, /* nowrap = */ true)
  }

  /** Static kernel shared by interpreted eval and generated code:
    * length of the raw-deflate stream of the UTF-8 payload. The
    * output is DISCARDED chunk by chunk — only the count survives, so
    * the working set is one 8 KB buffer per thread regardless of
    * document size. */
  def kernel(text: UTF8String): Int = {
    val d = deflaters.get()
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    val buf = buffers.get()
    var n = 0
    while (!d.finished()) {
      n += d.deflate(buf)
    }
    n
  }

  private val buffers = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }
}
