package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending,
  Attribute, Expression, JoinedRow, PredicateHelper, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.unsafe.types.UTF8String

/** Native as-of join — the whole-operator extension path (custom
  * `LogicalPlan` + `Rule` + `SparkStrategy` + `SparkPlan`) for the one
  * time-series operator Spark has no physical node for.
  *
  * Semantics (inner as-of, reference behavior of `q17`/pandas
  * `merge_asof`/DuckDB `ASOF JOIN`): for each left row, attach the
  * payload of the right row of the same key with the greatest
  * `right.ts <= left.ts`; ties on (key, ts) break to the highest
  * `rightTie`; left rows with no such right row are dropped.
  *
  * Why a physical operator when [[graft.queries.AsOf.asofJoin]]
  * (union + running `last`) is already scale-correct: the union
  * formulation shuffles |L|+|R| rows into ONE window pass — correct,
  * but it materializes a WindowExec buffer, carries every left column
  * through null-padded union slots, and cannot claim an output
  * ordering. This node plans like a sort-merge join instead: each side
  * shuffles ONCE on its own key (co-partitioned by EnsureRequirements,
  * AQE-coalescible), sorts within partitions ((key, ts) left /
  * (key, ts, tie) right), and a single streaming merge pass emits
  * matches with O(1) state — no window buffer, no union padding, and
  * the left sort order survives for downstream operators. At 100 TB
  * this is exactly the SMJ cost model: two exchanges, two sorts, one
  * pass.
  *
  * Column pruning: Catalyst's ColumnPruning does not descend into
  * custom nodes, so [[AsofJoin.asofJoin]] projects the right side to
  * key+ts+tie+payload before wrapping it — the scan prunes at
  * construction instead of by rule. Left-side predicate pushdown IS
  * rule-driven ([[AsofPushdown]]): filters on left output commute with
  * the join and land in the parquet scan. */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute, payload: Seq[Attribute],
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] to [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, tie, payload, fwd, tol) =>
      AsofJoinExec(lk, rk, lt, rt, tie, payload,
        planLater(l), planLater(r), fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Pushes deterministic left-only predicates below the as-of join —
  * dropping a left row never changes any other row's match, so the
  * filter commutes; pushed predicates then reach the scan via the
  * builtin pushdown rules. Right-side predicates do NOT commute (they
  * can change which right row is "most recent") and stay put. */
object AsofPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsofJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Physical streaming-merge as-of join. Children arrive co-partitioned
  * on the keys (ClusteredDistribution, enforced by EnsureRequirements)
  * and sorted within partitions; one forward pass per partition keeps
  * only the best-so-far right payload per key — O(1) state, zero
  * buffering, output streamed in left order. */
case class AsofJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute, payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan,
    forward: Boolean = false,
    toleranceMicros: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // the merge streams the left side in order, so both the left
  // partitioning and the left sort order survive to the output
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  // tolerance compares the time values as their underlying integral
  // form (micros for timestamps, days for dates, the value for
  // integral types) — enforced at the API layer
  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val payloadAttrs = payload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKT = UnsafeProjection.create(
        Seq[Expression](leftKey, leftTime), leftOut)
      val rKT = UnsafeProjection.create(
        Seq[Expression](rightKey, rightTime), rightOut)
      val rPay = UnsafeProjection.create(
        payloadAttrs.asInstanceOf[Seq[Expression]], rightOut)
      val result = UnsafeProjection.create(
        outAttrs.asInstanceOf[Seq[Expression]], leftOut ++ payloadAttrs)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead right row (valid until the next rIter.next())
        private var rHead: InternalRow = _
        private var rHeadKey: Any = _
        private var rHeadTime: Any = _
        // best-so-far payload and the (stable-copied) key it belongs to
        private var cur: UnsafeRow = _
        private var curKey: Any = _
        private var curTime: Any = _
        private var out: InternalRow = _

        // sorted-iterator rows are reused; values held across next()
        // calls need their own storage
        private def stable(v: Any): Any = v match {
          case s: UTF8String => s.clone()
          case other => other
        }

        private def loadRHead(): Boolean = {
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            val kt = rKT(r)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              rHead = r
              rHeadKey = kt.get(0, keyType)
              rHeadTime = kt.get(1, timeType)
            } // null key/time never matches anything: drop
          }
          rHead != null
        }

        /** Backward: consume right rows of key < lk (discard) or
          * key == lk with time <= lt (each becomes the new best match —
          * sort order makes the last one the greatest (ts, tie)). */
        private def advance(lk: Any, lt: Any): Unit = {
          var more = true
          while (more && loadRHead()) {
            val c = keyOrd.compare(rHeadKey, lk)
            if (c < 0) rHead = null
            else if (c == 0 && timeOrd.compare(rHeadTime, lt) <= 0) {
              cur = rPay(rHead).copy()
              curKey = stable(rHeadKey)
              curTime = stable(rHeadTime)
              rHead = null
            } else more = false
          }
        }

        /** Forward: discard right rows strictly before (lk, lt); the
          * lookahead head is then the earliest candidate at or after
          * lt — NOT consumed, later left rows may match it too. Ties
          * on (key, ts) break to the LOWEST tie (first in sort
          * order). */
        private def advanceForward(lk: Any, lt: Any): Unit = {
          var more = true
          while (more && loadRHead()) {
            val c = keyOrd.compare(rHeadKey, lk)
            if (c < 0 ||
              (c == 0 && timeOrd.compare(rHeadTime, lt) < 0)) rHead = null
            else more = false
          }
        }

        private def withinTol(lt: Any, rt: Any): Boolean =
          toleranceMicros.forall(t => math.abs(asLong(rt) - asLong(lt)) <= t)

        private def findNext(): Unit = {
          while (out == null && lIter.hasNext) {
            val l = lIter.next()
            val kt = lKT(l)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              val lk = kt.get(0, keyType)
              val lt = kt.get(1, timeType)
              if (forward) {
                advanceForward(lk, lt)
                if (rHead != null && keyOrd.compare(rHeadKey, lk) == 0 &&
                    withinTol(lt, rHeadTime))
                  out = result(joined(l, rPay(rHead)))
              } else {
                // best-so-far from an earlier (smaller) key is stale
                if (cur != null && keyOrd.compare(curKey, lk) != 0) {
                  cur = null
                  curKey = null
                  curTime = null
                }
                advance(lk, lt)
                if (cur != null && withinTol(lt, curTime))
                  out = result(joined(l, cur))
              }
            }
          }
        }

        override def hasNext: Boolean = { findNext(); out != null }
        override def next(): InternalRow = {
          findNext()
          val r = out
          out = null
          r
        }
      }
    }
  }
}

object AsofJoin {

  /** Idempotently activate the strategy + pushdown rule on a session
    * (the extensions path does the same for cluster deployments). */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsofPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsofPushdown
  }

  /** As-of join `left` to `right` on `key` with `right.ts <= left.ts`;
    * same surface as [[graft.queries.AsOf.asofJoin]]: payload columns
    * come back as `asof_<name>`, ties on right (key, ts) break to the
    * highest `rightTie`, unmatched left rows drop (inner as-of).
    *
    * The right side is projected to key+ts+tie+payload here — custom
    * nodes sit outside ColumnPruning's vocabulary, so pruning happens
    * at construction. Fresh aliases on that projection also give the
    * right side new expression ids, keeping self-joins (left and right
    * carved from the same source) unambiguous. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               ts: String, payload: Seq[String],
               rightTie: String): DataFrame =
    asofJoin(left, right, key, ts, payload, rightTie,
      forward = false, toleranceMicros = None)

  /** Full surface: `forward = true` matches each left row to the
    * EARLIEST right row with `right.ts >= left.ts` (time-to-next-event
    * — conversion lag, next-maintenance, retry attribution; ties on
    * (key, ts) break to the LOWEST `rightTie`), and `toleranceMicros`
    * bounds the match distance in the time column's integral unit
    * (micros for timestamps) — pandas `merge_asof`'s direction and
    * tolerance knobs. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               ts: String, payload: Seq[String], rightTie: String,
               forward: Boolean,
               toleranceMicros: Option[Long]): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    if (toleranceMicros.isDefined) {
      import org.apache.spark.sql.types._
      val dt = left.schema(ts).dataType
      require(Seq(TimestampType, TimestampNTZType, LongType, IntegerType,
        DateType, ShortType).contains(dt),
        s"asofJoin tolerance needs an integral-backed time column, got $dt")
    }
    val lPlan = DatasetBridge.analyzed(left)
    val rBase = DatasetBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asofJoin: column '$n' not found in ${p.output.map(_.name)}"))
    // prune + re-alias the right side (fresh exprIds, asof_ payload names)
    val keep = (Seq(key, ts, rightTie) ++ payload).distinct
    val rPlan = Project(keep.map { n =>
      val a = attr(rBase, n)
      val name = if (payload.contains(n)) s"asof_$n" else n
      Alias(a, name)()
    }, rBase)
    def rAttr(n: String): Attribute = attr(rPlan, n)
    val node = AsofJoinNode(lPlan, rPlan,
      attr(lPlan, key), rAttr(key),
      attr(lPlan, ts), rAttr(ts),
      rAttr(rightTie), payload.map(n => rAttr(s"asof_$n")),
      forward, toleranceMicros)
    DatasetBridge.ofRows(spark, node)
  }
}
