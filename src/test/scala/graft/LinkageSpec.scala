package graft

import org.apache.spark.sql.functions._
import graft.queries.Linkage

/** Blocked-fuzzy-join contracts: candidate generation, distance gate,
  * plan shape (equi-join, never a cartesian), and the demo corpus's
  * closed-form quality numbers. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "martha"), (2L, "melvin"), (3L, "stella"), (4L, "zz"))
    .toDF("lid", "lname")
  private def right = Seq(
    (10L, "marsha"),  // 1 edit from martha, same 3-prefix
    (20L, "melvins"), // 1 edit from melvin
    (30L, "steely"),  // 3 edits from stella, same block — must be cut
    (40L, "martha"))  // exact duplicate
    .toDF("rid", "rname")

  test("blockedLevenshteinJoin: distance gate on in-block candidates") {
    val got = Linkage.blockedLevenshteinJoin(left, "lname", right, "rname",
        n => substring(n, 1, 3), maxDist = 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 40L), (2L, 20L)),
      s"unexpected pair set $got")
  }

  test("blockedLevenshteinJoin: maxDist=0 keeps only exact matches") {
    val got = Linkage.blockedLevenshteinJoin(left, "lname", right, "rname",
        n => substring(n, 1, 3), maxDist = 0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 40L)))
  }

  test("blockedLevenshteinJoin: composite block keys compose (prefix " +
    "+ length band) and cross-block near-matches are invisible") {
    // melvin (6) vs melvins (7): same prefix, adjacent length bands of
    // width 1 — blocking deliberately trades that recall for scale.
    val got = Linkage.blockedLevenshteinJoin(left, "lname", right, "rname",
        n => concat(substring(n, 1, 3), length(n)), maxDist = 1)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 40L)))
  }

  test("plan shape: equi-join on the block key, no cartesian, no UDF") {
    val df = Linkage.blockedLevenshteinJoin(left, "lname", right, "rname",
      n => substring(n, 1, 3), maxDist = 1)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("ScalaUDF"), "levenshtein must stay codegen'd")
  }

  test("l02 demo: recall is total (the edit never leaves the block) " +
    "and every correct pair is found at distance 1") {
    val row = Linkage.linkageQuality(spark, sfDir).collect().head
    assert(row.getAs[Long]("recall_milli") == 1000L)
    assert(row.getAs[Long]("n_correct") == row.getAs[Long]("n_truth"))
    assert(row.getAs[Long]("n_pred") >= row.getAs[Long]("n_truth"))
  }

  test("l01 demo: pair set is invariant to partition layout") {
    val a = Linkage.linkagePairs(spark, sfDir).collect().toSeq
    val b = Linkage.linkagePairs(spark, sfDir).repartition(7)
      .sortWithinPartitions("cust_id", "rec_id").collect().toSeq
    assert(a.toSet == b.toSet)
  }
}
