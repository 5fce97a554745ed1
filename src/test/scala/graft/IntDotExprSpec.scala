package graft

import org.apache.spark.sql.functions._
import graft.expr.IntDotProduct

/** The native integer-dot expression behind d09: exact parity with
  * the composed aggregate(zip_with(...)) formulation it replaced,
  * SQL registration, and null behavior. */
class IntDotExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(seed: Int, n: Int, dim: Int = 64): Seq[Seq[Int]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(r.nextInt(255) - 127))
  }

  test("exact parity with the composed zip_with/aggregate dot") {
    val df = vecs(1, 200).zip(vecs(2, 200)).toDF("x", "y")
    val composed = aggregate(zip_with(col("x"), col("y"),
      (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, v) => acc + v)
    val rows = df.select(
      IntDotProduct.intDot(col("x"), col("y")).as("native"),
      composed.as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("mismatched lengths use the common prefix; null propagates") {
    val out = Seq((Seq(2, 3, 99), Seq(4, 5)))
      .toDF("x", "y")
      .select(IntDotProduct.intDot(col("x"), col("y"))).collect()
    assert(out.head.getLong(0) == 23)
    val nul = Seq((Some(Seq(1, 2)), Option.empty[Seq[Int]]))
      .toDF("x", "y")
      .select(IntDotProduct.intDot(col("x"), col("y"))).collect()
    assert(nul.head.isNullAt(0))
  }

  test("non-array<int> arguments are rejected at analysis time") {
    graft.GraftExtensions.register(spark)
    Seq((Seq(1L, 2L), Seq(0.5f, 1.5f))).toDF("xl", "yf")
      .createOrReplaceTempView("intdot_bad")
    // array<bigint>/array<float> would silently misread element bytes
    // in the getInt kernel — the analyzer must refuse instead
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT int_dot(xl, yf) FROM intdot_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<int>"))
  }

  test("SQL registration: int_dot usable from spark.sql") {
    graft.GraftExtensions.register(spark)
    Seq((Seq(1, 2, 3), Seq(3, 2, 1))).toDF("x", "y")
      .createOrReplaceTempView("intdot_t")
    val got = spark.sql("SELECT int_dot(x, y) FROM intdot_t")
      .collect().head.getLong(0)
    assert(got == 10L)
  }
}
