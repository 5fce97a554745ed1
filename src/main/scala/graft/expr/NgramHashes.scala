package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression emitting the 64-bit hash of every
  * token n-gram of a space-tokenized string — the shingling kernel of
  * benchmark decontamination (t09) and any n-gram-overlap join. The
  * declarative formulation (`transform(sequence(...),
  * i -> xxhash64(concat_ws(" ", slice(tokens, i, n))))`) materializes
  * a token array plus one concatenated string PER WINDOW; this
  * expression makes one pass over the UTF-8 bytes, hashes each word
  * once, and chains word hashes per window — no per-window string
  * allocation, fully inside whole-stage codegen via [[doGenCode]].
  *
  * Hash family: FNV-1a per word (byte-level, same as
  * [[MinHashSignature]]) chained through splitmix64 per window. Values
  * are engine-internal — both sides of an overlap join must use this
  * same expression. */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n-gram size must be positive, is $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    NgramHashes.kernel(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = NgramHashes.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$kernel.kernel($c, $n)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramHashes = copy(child = newChild)
}

object NgramHashes {

  /** Column-level API. */
  def ngramHashes(c: Column, n: Int): Column =
    ColumnBridge.column(NgramHashes(ColumnBridge.expression(c), n))

  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def kernel(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // one FNV-1a hash per space-separated word (empty words included,
    // mirroring split(text, " ") semantics)
    var nWords = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') nWords += 1
      i += 1
    }
    if (nWords < n) return new GenericArrayData(Array.empty[Long])
    val wordHash = new Array[Long](nWords)
    var w = 0
    var h = 0xcbf29ce484222325L
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') {
        wordHash(w) = h
        w += 1
        h = 0xcbf29ce484222325L
      } else {
        h = (h ^ (b & 0xff)) * 0x100000001b3L
      }
      i += 1
    }
    wordHash(w) = h
    // chain the n word hashes of each window through splitmix64
    val out = new Array[Long](nWords - n + 1)
    var s = 0
    while (s < out.length) {
      var g = 0L
      var j = 0
      while (j < n) {
        g = mix64(g ^ wordHash(s + j))
        j += 1
      }
      out(s) = g
      s += 1
    }
    new GenericArrayData(out)
  }
}
