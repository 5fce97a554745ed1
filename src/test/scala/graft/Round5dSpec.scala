package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{AsofJoin, AsofJoinNode}
import graft.queries.AsOf

/** Round-5 session-5: the native as-of join physical operator —
  * semantics pins on closed-form frames, bit-parity vs the proven
  * union+window formulation, plan shape, and rule-driven pushdown. */
class Round5dSpec extends SparkSpec {

  import spark.implicits._

  private def lhs: DataFrame = Seq(
    // (key, ts, tag)
    (1L, 10L, "l-a"), (1L, 20L, "l-b"), (1L, 5L, "l-early"),
    (2L, 50L, "l-c"), // key with no right rows at all
    (3L, 30L, "l-d"), (3L, 31L, "l-e"),
    (4L, 7L, "l-before-any") // right rows exist but all later
  ).toDF("k", "t", "ltag")

  private def rhs: DataFrame = Seq(
    // (key, ts, tie, payload)
    (1L, 10L, 1L, "r1@10#1"), (1L, 10L, 2L, "r1@10#2"), // tie on ts=10
    (1L, 15L, 1L, "r1@15"),
    (3L, 30L, 7L, "r3@30"), (3L, 29L, 9L, "r3@29"),
    (4L, 100L, 1L, "r4@100")
  ).toDF("k", "t", "tie", "pay")

  test("asof native: inclusive boundary, highest-tie wins, unmatched " +
    "left rows drop, state resets across keys") {
    val got = AsofJoin.asofJoin(lhs, rhs, "k", "t",
      payload = Seq("pay"), rightTie = "tie")
      .select("k", "t", "ltag", "asof_pay")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(
      // ts=10 matches the ts=10 right rows inclusively; tie 2 wins
      (1L, 10L, "l-a", "r1@10#2"),
      // ts=20: most recent right is 15
      (1L, 20L, "l-b", "r1@15"),
      // l-early (ts=5) has no right <= 5 → dropped; key 2 → dropped;
      // key 4's only right row is later → dropped
      (3L, 30L, "l-d", "r3@30"),
      (3L, 31L, "l-e", "r3@30")))
  }

  test("asof native: empty right side yields empty inner result") {
    val got = AsofJoin.asofJoin(lhs, rhs.filter(col("k") === -1),
      "k", "t", payload = Seq("pay"), rightTie = "tie")
    assert(got.count() == 0)
  }

  test("q31 native operator == q17 union+window formulation, " +
    "row for row") {
    val native = AsOf.q31AsofNative(spark, sfDir).collect().toSeq
    val window = AsOf.q17AsofJoin(spark, sfDir).collect().toSeq
    assert(native.nonEmpty && native == window)
  }

  test("q31 plan: AsofJoin physical node, no window buffer, " +
    "exactly one exchange per side") {
    val df = AsOf.q31AsofNative(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
    assert(!p.contains("Window"), s"window buffer crept back:\n$p")
    // two join-side exchanges + the orderBy's range exchange
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"unexpected extra shuffles ($exchanges):\n$p")
  }

  test("asof pushdown rule: deterministic left-only predicates land " +
    "below the node and reach the parquet scan") {
    val e = queries.Streaming.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val joinedThenFiltered = AsofJoin.asofJoin(purchases, signups,
      "user_id", "ts", Seq("value"), "event_id")
      .filter(col("event_id") % 2 === 0) // left-only predicate, applied ABOVE
    val opt = joinedThenFiltered.queryExecution.optimizedPlan
    val nodes = opt.collect { case n: AsofJoinNode => n }
    assert(nodes.length == 1, opt.toString)
    val leftHasFilter = nodes.head.left.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(leftHasFilter.nonEmpty,
      s"left-only filter not pushed below AsofJoinNode:\n$opt")
    // and the same result as filtering before the join
    val pre = AsofJoin.asofJoin(
      purchases.filter(col("event_id") % 2 === 0), signups,
      "user_id", "ts", Seq("value"), "event_id")
    assert(joinedThenFiltered.collect().toSeq == pre.collect().toSeq)
  }
}
