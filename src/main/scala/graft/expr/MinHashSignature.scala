package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression computing a k-min-hash signature over
  * word-3-gram shingles — the hot inner loop of MinHash-LSH dedup at
  * 100 TB. A Scala UDF pays per-row UTF8String→String→Seq boxing and a
  * catalyst↔scala converter on the result; this expression works
  * directly on the internal representations and participates in
  * whole-stage codegen via [[doGenCode]] (the generated code calls the
  * static kernel below — the same pattern Spark's own non-trivial
  * expressions use).
  *
  * Same signature *family* as graft.queries.Dedup.minhashSignature
  * (word-3-gram shingles → splitmix64-remixed per-k min), but with a
  * byte-level FNV-1a word hash instead of MurmurHash3 over decoded
  * Strings — the two paths are NOT signature-compatible; use one
  * consistently per signature table. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.kernel(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = MinHashSignature.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.kernel($c, $k)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {

  /** Column-level API. */
  def minhashSignature(c: Column, k: Int = 32): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(c), k))

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over a UTF8String slice — avoids materializing per-word
    * Strings entirely. */
  @inline private def hashSlice(bytes: Array[Byte], from: Int,
                                until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** Static kernel invoked from both interpreted eval and generated
    * code. Single allocation-free pass over the UTF-8 bytes. */
  def kernel(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    // collect word hashes (split on single space, as the corpus uses)
    var nWords = 0
    var i = 0
    while (i <= bytes.length) { // count words
      if (i == bytes.length || bytes(i) == ' ') nWords += 1
      i += 1
    }
    val wh = new Array[Long](nWords)
    var w = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        wh(w) = hashSlice(bytes, start, i)
        w += 1
        start = i + 1
      }
      i += 1
    }
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s + 2 < nWords) {
      val base = mix64(wh(s) * 31L + wh(s + 1) * 1299709L + wh(s + 2))
      var j = 0
      while (j < k) {
        val h = mix64(base ^ (j * 0x9e3779b97f4a7c15L)) & 0xffffffffL
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}
