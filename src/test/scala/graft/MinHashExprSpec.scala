package graft

import org.apache.spark.sql.functions._
import graft.expr.MinHashSignature

/** The custom Catalyst expression: semantics, codegen, and the reason
  * it exists (beats the equivalent Scala UDF). */
class MinHashExprSpec extends SparkSpec {
  import spark.implicits._

  private def sig(texts: Seq[String], k: Int = 32) =
    texts.toDF("t")
      .select(MinHashSignature.minhashSignature(col("t"), k).as("s"))
      .collect().map(_.getSeq[Long](0))

  test("signature shape and value range") {
    val s = sig(Seq("a b c d e f g h", "one two three four"))
    assert(s.forall(_.length == 32))
    assert(s.flatten.forall(v => v >= 0L))
    // distinct texts -> distinct signatures
    assert(!s(0).sameElements(s(1)))
  }

  test("near-duplicate texts share most signature positions") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 48).map(i => s"w$i").mkString(" ") // drop 2 words
    val far = (100 to 150).map(i => s"w$i").mkString(" ")
    val Array(a, b, c) = sig(Seq(base, nearDup, far))
    def overlap(x: Seq[Long], y: Seq[Long]) =
      x.zip(y).count { case (p, q) => p == q }
    assert(overlap(a, b) >= 24, s"near-dup overlap ${overlap(a, b)}/32")
    assert(overlap(a, c) <= 4, s"far overlap ${overlap(a, c)}/32")
  }

  test("short texts (under 3 words) yield the empty-set signature") {
    val s = sig(Seq("", "one", "one two"))
    assert(s.forall(_.forall(_ == Long.MaxValue)))
  }

  test("expression is codegen'd (no CodegenFallback) and matches " +
    "interpreted eval") {
    val df = Seq.fill(100)("alpha beta gamma delta epsilon").toDF("t")
      .select(MinHashSignature.minhashSignature(col("t")).as("s"))
    df.collect() // would throw if generated code is invalid
    // interpreted eval agrees with codegen result
    val expr = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "alpha beta gamma delta epsilon")), 32)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
    assert(df.head.getSeq[Long](0).toArray.sameElements(interpreted))
  }

  test("throughput: expression vs equivalent Scala UDF (informational)") {
    val docs = (0 until 20000)
      .map(i => (0 until 80).map(j => s"w${(i * 31 + j * 7) % 500}")
        .mkString(" ")).toDF("t")
    docs.persist().count()
    val exprNs = {
      val t0 = System.nanoTime()
      docs.select(MinHashSignature.minhashSignature(col("t")).as("s"))
        .agg(sum(element_at(col("s"), 1))).collect()
      System.nanoTime() - t0
    }
    val udfFn = udf(graft.queries.Dedup.minhashSignature _)
    val udfNs = {
      val t0 = System.nanoTime()
      docs.select(udfFn(col("t")).as("s"))
        .agg(sum(element_at(col("s"), 1))).collect()
      System.nanoTime() - t0
    }
    info(f"expression: ${exprNs / 1e6}%.0f ms, udf: ${udfNs / 1e6}%.0f ms")
    docs.unpersist()
    // no hard assertion — JIT noise — but the expression must not be
    // drastically slower
    assert(exprNs < udfNs * 3)
  }

  test("SQL registration: minhash_signature usable from spark.sql") {
    graft.GraftExtensions.register(spark)
    Seq("alpha beta gamma delta").toDF("t").createOrReplaceTempView("mh_in")
    val viaSql = spark.sql(
      "SELECT minhash_signature(t, 32) AS s FROM mh_in")
      .head.getSeq[Long](0)
    val viaCol = sig(Seq("alpha beta gamma delta")).head
    assert(viaSql.sameElements(viaCol))
    // default k
    assert(spark.sql("SELECT minhash_signature(t) AS s FROM mh_in")
      .head.getSeq[Long](0).length == 32)
  }
}
