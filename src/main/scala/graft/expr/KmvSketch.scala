package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, NullType}

/** Bounded k-minimum-values state: the k smallest DISTINCT hash
  * values seen. TreeSet keeps membership + max in O(log k); state
  * never exceeds k entries regardless of input cardinality. */
final class KmvState(val k: Int) {
  val mins = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last && !mins.contains(h)) {
      mins.add(h); mins.remove(mins.last); ()
    }
  }

  def merge(other: KmvState): KmvState = {
    val it = other.mins.iterator()
    while (it.hasNext) add(it.next())
    this
  }
}

/** `kmv_sketch(hash, k)` — KMV distinct-cardinality sketch
  * (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"): aggregate the k smallest distinct hash values per
  * group. The RESULT is the sketch itself (a ≤k-element sorted
  * array) — mergeable and storable, so per-partition sketches can be
  * persisted and set-combined later without rescanning the corpus:
  * union = merge-and-trim, distinct estimate = (k−1)/u(kth min),
  * intersection = inclusion–exclusion. State is k longs regardless
  * of input size — the 100 TB property exact distinct lacks. The
  * estimate is a deterministic function of (data, hash), so the
  * error CONTRACT is oracle-checkable even though the value is
  * engine-specific (sk01_kmv_inv).
  *
  * Error contract, measured (Round8Spec k-sweep, 1M distinct
  * xxhash64'd range ids; theory: rel. std. error ≈ 1/√(k−2)):
  * {{{
  *   k     | 1σ bound | measured rel. error
  *   64    | 12.7%    | 18.1% (1.4σ)
  *   256   |  6.3%    |  3.7%
  *   1024  |  3.1%    |  0.2%
  * }}}
  * Memory is 8k bytes per group either way — k=1024 buys ~1% typical
  * error for 8 KB/group, the setting a 100 TB audience-overlap audit
  * would run at. sk01's gate deliberately runs k=64 (the audit
  * margins in queries/Sketches.scala are sized to ~2.3σ at that k);
  * this sweep is the evidence that tightening the margins is a
  * k-knob turn, not an algorithm change.
  *
  * TypedImperativeAggregate like [[MisraGriesTopK]]: JVM-object
  * buffer with explicit serialize/merge, partial-aggregable across
  * any merge tree (order-independent here — set semantics). */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {
  require(k >= 2, s"kmv_sketch: k must be >= 2, is $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: LongType | NullType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint (hash) argument, " +
          s"got ${other.catalogString}")
    }

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buffer: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvState, input: KmvState): KmvState =
    buffer.merge(input)

  override def eval(buffer: KmvState): Any = {
    val arr = new Array[Any](buffer.mins.size)
    val it = buffer.mins.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: KmvState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.mins.size)
    val it = buffer.mins.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val state = new KmvState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { state.mins.add(in.readLong()); i += 1 }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {

  /** Column-level API (aggregate — use inside `agg(...)`). */
  def kmvSketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Driver-side estimator over an eval'd sketch (sorted ascending
    * SIGNED longs — xxhash64 output order; normalize to [0,1) by the
    * unsigned mapping). Exact when the set fit the sketch. */
  def estimateDistinct(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else {
      val kth = (sketch(k - 1).toDouble - Long.MinValue.toDouble) /
        math.pow(2, 64)
      (k - 1) / kth
    }

  /** Union sketch: merged distinct mins, trimmed to k. */
  def unionSketch(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    (a ++ b).distinct.sorted.take(k)
}
