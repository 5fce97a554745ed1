package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Mutable Misra-Gries summary: at most `k` tracked tokens with
  * underestimating counts, plus the total mass `deducted` from any
  * single token by decrement rounds and merge subtractions. For every
  * token (tracked or not): `est <= true <= est + deducted`, and
  * `deducted <= N / (k+1)` — so any token with true frequency
  * > N/(k+1) is guaranteed tracked. */
final class MisraGriesSketch(val k: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty
  var deducted: Long = 0L

  def add(token: UTF8String): Unit = counts.get(token) match {
    case Some(c) => counts.update(token, c + 1)
    case None if counts.size < k => counts.update(token.clone(), 1L)
    case None =>
      // decrement round: the incoming token and every tracked one
      // each give up 1 — absorbs k+1 mass, so rounds <= N/(k+1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      counts.keysIterator.foreach { t =>
        val c = counts(t) - 1
        if (c == 0) dead += t else counts.update(t, c)
      }
      dead.foreach(counts.remove)
      deducted += 1
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): add
    * counters pointwise, then restore the k-counter budget by
    * subtracting the (k+1)-th largest count from every counter —
    * that subtraction hits at least k+1 positive counters, so the
    * `deducted <= N/(k+1)` bound survives the merge tree. */
  def merge(other: MisraGriesSketch): MisraGriesSketch = {
    val out = new MisraGriesSketch(k)
    out.deducted = deducted + other.deducted
    counts.foreach { case (t, c) => out.counts.update(t, c) }
    other.counts.foreach { case (t, c) =>
      out.counts.update(t, out.counts.getOrElse(t, 0L) + c)
    }
    if (out.counts.size > k) {
      val cut = out.counts.valuesIterator.toArray.sorted(
        Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      out.counts.keysIterator.foreach { t =>
        val c = out.counts(t) - cut
        if (c <= 0) dead += t else out.counts.update(t, c)
      }
      dead.foreach(out.counts.remove)
      out.deducted += cut
    }
    out
  }
}

/** Custom Catalyst aggregate function — distributed Misra-Gries top-k
  * heavy hitters over a string column. The guarantee survives Spark's
  * partial-aggregate protocol: per-partition sketches build map-side
  * (one pass — raw tokens never shuffle), partials merge via the
  * mergeable-summaries rule, and every token with true frequency
  * > N/(k+1) is present in the result with
  * `est <= true <= est + err`. The exact histogram (t10) shuffles
  * every distinct token; this ships at most k rows per partition —
  * the shape that survives a 100 TB vocabulary.
  *
  * This is the [[TypedImperativeAggregate]] extension surface — an
  * arbitrary-JVM-object aggregation buffer with explicit serialize /
  * merge — complementing the repo's scalar codegen expressions.
  * Estimates are merge-order-dependent (engine-internal): queries
  * expose them rows-only, with the recall/bound CONTRACT
  * oracle-checked (t22_heavy_inv). */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSketch] {
  require(k >= 1, s"mg_topk: k must be positive, is $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "mg_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): MisraGriesSketch =
    new MisraGriesSketch(k)

  override def update(buffer: MisraGriesSketch,
                      input: InternalRow): MisraGriesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MisraGriesSketch,
                     input: MisraGriesSketch): MisraGriesSketch =
    buffer.merge(input)

  override def eval(buffer: MisraGriesSketch): Any = {
    val rows = buffer.counts.toSeq
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(t, c, buffer.deducted) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: MisraGriesSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeLong(buffer.deducted)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new MisraGriesSketch(in.readInt())
    sketch.deducted = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      sketch.counts.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    sketch
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)
}

object MisraGriesTopK {

  /** Column-level API (aggregate — use inside `agg(...)`). */
  def mgTopK(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesTopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
