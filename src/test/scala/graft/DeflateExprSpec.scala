package graft

import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.functions._

/** Contracts for the native [[graft.expr.DeflateLength]] expression
  * (t40's corpus-scan kernel). */
class DeflateExprSpec extends SparkSpec {

  /** Independent one-shot reference (fresh Deflater per call, no
    * pooling) — catches a reuse bug in the pooled kernel. */
  private def referenceLen(s: String): Int = {
    val d = new Deflater(6, true)
    d.setInput(s.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  test("pooled kernel == fresh-deflater reference for every corpus " +
    "document and edge rows, repeated (reset() correctness)") {
    import spark.implicits._
    val docs = queries.Relational.table(spark, sfDir, "documents")
      .select(col("text")).as[String].collect().toSeq ++
      Seq("", "a", "ab" * 5000, "é世界" * 100,
        new String(Array.tabulate(9000)(i => (33 + (i * 7919) % 90).toChar)))
    // two passes over the same thread-pooled kernel: identical output
    // proves reset() restores pristine state between rows
    (1 to 2).foreach { _ =>
      docs.foreach { t =>
        val got = graft.expr.DeflateLength.kernel(
          org.apache.spark.unsafe.types.UTF8String.fromString(t))
        assert(got == referenceLen(t), s"mismatch for ${t.take(40)}")
      }
    }
  }

  test("round-trip: the counted stream really is a complete raw-deflate " +
    "stream (inflating a fresh compression of the doc restores it)") {
    val t = "the quick brown fox " * 40
    val d = new Deflater(6, true)
    d.setInput(t.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](1 << 16)
    val n = d.deflate(buf)
    d.end()
    assert(n == graft.expr.DeflateLength.kernel(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    val inf = new Inflater(true)
    inf.setInput(buf, 0, n)
    val out = new Array[Byte](t.getBytes("UTF-8").length + 16)
    val m = inf.inflate(out)
    inf.end()
    assert(new String(out, 0, m, "UTF-8") == t)
  }

  test("interpreted eval == codegen path") {
    import spark.implicits._
    val df = Seq("hello world", "aaaaaaaaaaaaaaaaaaaa", "").toDF("t")
    val native = df.select(
      graft.expr.DeflateLength.deflateLength(col("t"))).collect()
      .map(_.getInt(0)).toSeq
    val interpreted = df.collect().map(r =>
      graft.expr.DeflateLength.kernel(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          r.getString(0)))).toSeq
    assert(native == interpreted)
  }

  test("separation: degenerate repetition compresses an order of " +
    "magnitude below natural text") {
    def ratioMilli(s: String): Long =
      graft.expr.DeflateLength.kernel(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) * 1000L /
        s.getBytes("UTF-8").length
    assert(ratioMilli("ab" * 1000) < 100)
    assert(ratioMilli("the five boxing wizards jump quickly over lazy " +
      "dogs and vexed jackdaws near my quartz sphinx today") > 500)
  }

  test("sql surface: deflate_length registered and null-safe") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT deflate_length('hello world') AS d, deflate_length(NULL) AS n")
      .collect().head
    assert(out.getInt(0) == referenceLen("hello world"))
    assert(out.isNullAt(1))
  }

  test("analysis-time rejection of non-string input") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT deflate_length(array(1, 2))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }
}
