package graft.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType,
  LongType, NumericType}

/** Serialization of Greenwald–Khanna summary state — the exact state
  * `approx_percentile` builds internally (Spark's
  * [[org.apache.spark.sql.catalyst.util.QuantileSummaries]]), exposed
  * as STORABLE bytes so the 100 TB profiling pattern works end to
  * end: build per-epoch sketches in one pass, PERSIST them (parquet
  * binary column), and answer any later quantile question — including
  * cross-epoch ones — by merging stored states, never rescanning the
  * corpus. `percentile_approx` alone can't do this: its GK partials
  * live and die inside one plan (the sk03 limitation this closes).
  *
  * Format (version byte first, so the stored-state contract can
  * evolve): 1B version, 8B relativeError, 4B compressThreshold,
  * 8B count, 4B #tuples, then (value: 8B, g: 8B, delta: 8B) per
  * sampled tuple. State size is O((1/ε)·log(εn)) tuples — ~KBs per
  * group at ε = 0.001 regardless of input size. */
private[graft] object GkStateCodec {
  private val Version: Byte = 1

  def serialize(qs: QuantileSummaries): Array[Byte] = {
    // flush the insert head buffer so `sampled` is the whole state
    val c = if (qs.compressed) qs else qs.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Version)
    out.writeDouble(c.relativeError)
    out.writeInt(c.compressThreshold)
    out.writeLong(c.count)
    out.writeInt(c.sampled.length)
    c.sampled.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = in.readByte()
    require(v == Version, s"gk state version $v, expected $Version")
    val relativeError = in.readDouble()
    val compressThreshold = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.fill(n) {
      val value = in.readDouble(); val g = in.readLong()
      val delta = in.readLong()
      QuantileSummaries.Stats(value, g, delta)
    }
    new QuantileSummaries(compressThreshold, relativeError, sampled,
      count, true)
  }

  def mergeStates(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries =
    if (a.count == 0) b
    else if (b.count == 0) a
    else {
      // merging states built at different accuracies would silently
      // carry the left operand's eps while containing coarser data —
      // the advertised rank band would be violated with no error
      require(a.relativeError == b.relativeError,
        s"gk_merge: cannot merge states with different accuracies " +
          s"(relativeError ${a.relativeError} vs ${b.relativeError}); " +
          "rebuild one side at the other's accuracy")
      val ca = if (a.compressed) a else a.compress()
      val cb = if (b.compressed) b else b.compress()
      ca.merge(cb)
    }
}

/** `gk_sketch(value, accuracy)` — build GK quantile-summary state and
  * return it SERIALIZED ([[GkStateCodec]]): per-group rank error is
  * ≤ count/accuracy (relativeError = 1/accuracy, `percentile_approx`'s
  * knob convention). TypedImperativeAggregate like [[KmvSketchAgg]]:
  * JVM-object buffer, partial-aggregable across any merge tree. The
  * returned bytes round-trip through any binary-preserving sink and
  * feed [[GkMergeAgg]] / [[GkEstimate]]. */
case class GkSketchAgg(
    child: Expression,
    accuracy: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {
  require(accuracy >= 2, s"gk_sketch: accuracy must be >= 2, is $accuracy")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gk_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric argument, got ${other.catalogString}")
    }

  private val toDouble =
    org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType)

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      1.0 / accuracy)

  override def update(buffer: QuantileSummaries,
      input: InternalRow): QuantileSummaries = {
    val v = toDouble.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double]) else buffer
  }

  override def merge(buffer: QuantileSummaries,
      input: QuantileSummaries): QuantileSummaries =
    GkStateCodec.mergeStates(buffer, input)

  override def eval(buffer: QuantileSummaries): Any =
    GkStateCodec.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkStateCodec.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkStateCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkSketchAgg =
    copy(child = newChildren.head)
}

/** `gk_merge(state)` — merge STORED GK states (the binary column
  * [[GkSketchAgg]] emitted, read back from wherever it was persisted)
  * into one summary, returned serialized again. This is the
  * cross-epoch half of the profiling pattern: the corpus is never
  * touched. Merge keeps the rank guarantee in the ε of its inputs
  * (Spark's post-SPARK-32908 merge re-derives deltas), but callers
  * auditing merged estimates should size bands with headroom — the
  * engine's inv rows use 2ε·n (see queries/Sketches.scala sk04). */
case class GkMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSummaries] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "gk_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary gk state argument, " +
          s"got ${other.catalogString}")
    }

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError)

  override def update(buffer: QuantileSummaries,
      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else GkStateCodec.mergeStates(buffer,
      GkStateCodec.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: QuantileSummaries,
      input: QuantileSummaries): QuantileSummaries =
    GkStateCodec.mergeStates(buffer, input)

  override def eval(buffer: QuantileSummaries): Any =
    GkStateCodec.serialize(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    GkStateCodec.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    GkStateCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GkMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GkMergeAgg =
    copy(child = newChildren.head)
}

/** `gk_estimate(state, q)` — quantile readout from a stored GK state.
  * Returns the sampled input element whose rank is within ε·count of
  * ⌈q·count⌉ (null for an empty state). CodegenFallback: readout runs
  * on #groups rows (sketch-readout small side), never on the corpus. */
case class GkEstimate(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary gk state, double q), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "gk_estimate"

  override protected def nullSafeEval(state: Any, q: Any): Any = {
    val qs = GkStateCodec.deserialize(state.asInstanceOf[Array[Byte]])
    qs.query(q.asInstanceOf[Double]).getOrElse(null)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GkEstimate =
    copy(left = newLeft, right = newRight)
}

/** `gk_rank(state, v)` — the CDF readout from a stored GK state: the
  * estimated RANK of value `v` (≈ #input values ≤ v), the inverse of
  * [[GkEstimate]]'s quantile query and the readout a cost-based
  * optimizer needs for range-predicate SELECTIVITY (est rows in
  * (lo, hi] = gk_rank(hi) − gk_rank(lo), error ≤ 2ε·n by the GK
  * invariant). Standard GK rank query: for v bracketed by samples i
  * and i+1, the true rank lies in [rmin_i, rmax_{i+1} − 1] where
  * rmin_i = Σ_{j≤i} g_j and rmax_{i+1} = rmin_{i+1} + Δ_{i+1}; the
  * estimate is the midpoint. CodegenFallback like the other GK
  * readouts: runs on #predicates rows, never the corpus. */
case class GkRank(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary gk state, double value), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "gk_rank"

  override protected def nullSafeEval(state: Any, v: Any): Any = {
    val x = v.asInstanceOf[Double]
    // NaN fails every ordering guard below and would fall into the
    // bracket branch at i=0, returning a plausible-looking rank —
    // poison for a selectivity estimate. No rank is defined for NaN.
    if (x.isNaN) return null
    val qs = GkStateCodec.deserialize(state.asInstanceOf[Array[Byte]])
    val s = qs.sampled
    if (qs.count == 0 || s.isEmpty) 0.0
    else if (x < s.head.value) 0.0
    else if (x >= s.last.value) qs.count.toDouble
    else {
      // walk to the last sample ≤ x; cum = rmin of that sample
      var cum = 0L
      var i = 0
      while (i < s.length && s(i).value <= x) {
        cum += s(i).g
        i += 1
      }
      // i is now the first sample > x (exists: x < last value)
      val rmaxNext = cum + s(i).g + s(i).delta
      (cum + rmaxNext - 1) / 2.0
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GkRank =
    copy(left = newLeft, right = newRight)
}

/** `gk_count(state)` — the input count a stored GK state summarizes
  * (the n that sizes its rank band). */
case class GkCount(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary gk state argument, " +
          s"got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  // null state in -> null out (UnaryExpression's default null handling)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gk_count"

  override protected def nullSafeEval(state: Any): Any =
    GkStateCodec.deserialize(state.asInstanceOf[Array[Byte]]).count

  override protected def withNewChildInternal(
      newChild: Expression): GkCount = copy(child = newChild)
}

object GkSketchAgg {

  /** Column-level API (aggregate — use inside `agg(...)`). */
  def gkSketch(c: Column, accuracy: Int): Column =
    ColumnBridge.column(
      GkSketchAgg(ColumnBridge.expression(c), accuracy)
        .toAggregateExpression())

  /** Merge stored states (aggregate — use inside `agg(...)`). */
  def gkMerge(c: Column): Column =
    ColumnBridge.column(
      GkMergeAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** Quantile readout from a stored state (scalar). */
  def gkEstimate(state: Column, q: Double): Column =
    ColumnBridge.column(GkEstimate(ColumnBridge.expression(state),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))

  /** Summarized-input count of a stored state (scalar). */
  def gkCount(state: Column): Column =
    ColumnBridge.column(GkCount(ColumnBridge.expression(state)))

  /** Estimated rank of a value in a stored state (scalar; the CDF /
    * selectivity readout). `v` may vary per row. */
  def gkRank(state: Column, v: Column): Column =
    ColumnBridge.column(GkRank(ColumnBridge.expression(state),
      ColumnBridge.expression(v)))
}
