package graft

import org.apache.spark.sql.functions._
import graft.expr.NgramHashes

/** The native n-gram hash expression: window semantics, split parity,
  * codegen participation, SQL registration. */
class NgramExprSpec extends SparkSpec {
  import spark.implicits._

  private def grams(texts: Seq[String], n: Int): Array[Seq[Long]] =
    texts.toDF("t")
      .select(NgramHashes.ngramHashes(col("t"), n).as("g"))
      .collect().map(_.getSeq[Long](0))

  test("window count = tokens - n + 1; short texts yield empty") {
    val out = grams(Seq("a b c d e", "a b", "", "a b c"), 3)
    assert(out.map(_.length).toSeq == Seq(3, 0, 0, 1))
  }

  test("equal token windows hash equal; any token change breaks the " +
    "window; empty tokens count like split(text, ' ')") {
    val Array(a, b, c) = grams(Seq("w1 w2 w3 x y", "z w1 w2 w3 q",
      "w1 w2 W3 x y"), 3)
    // the "w1 w2 w3" window appears in both a and b
    assert(a.toSet.intersect(b.toSet).size == 1)
    // case change in one token kills that window's hash
    assert(!c.contains(a.head))
    // double space introduces an empty token, shifting every window
    val Array(d, e) = grams(Seq("a b c d", "a  b c d"), 3)
    assert(d.length == 2 && e.length == 3)
    assert(d.toSet.intersect(e.toSet).size == 1) // only "b c d" survives
  }

  test("sliding windows are position-chained, not order-free") {
    val Array(g) = grams(Seq("a b a b a"), 2)
    // windows: ab, ba, ab, ba — exactly 2 distinct values, interleaved
    assert(g.length == 4)
    assert(g.toSet.size == 2)
    assert(g(0) == g(2) && g(1) == g(3) && g(0) != g(1))
  }

  test("codegen and interpreted eval agree; SQL registration works") {
    val expr = NgramHashes(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c d")), 2)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    val codegen = grams(Seq("a b c d"), 2).head
    assert(codegen.toArray.sameElements(interpreted))
    graft.GraftExtensions.register(spark)
    Seq("a b c d").toDF("t").createOrReplaceTempView("ng_in")
    val viaSql = spark.sql("SELECT ngram_hashes(t, 2) AS g FROM ng_in")
      .head.getSeq[Long](0)
    assert(viaSql.toArray.sameElements(interpreted))
  }
}
