package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.Gecko
import graft.mut.Mutators

/** ScalaCheck-driven property tests for the splice-expression mutators
  * (SURVEY.md §5): length algebra and multiset preservation over
  * arbitrary strings, evaluated in a single Spark job per property
  * (per-sample jobs would be prohibitively slow). */
class SplicePropertySpec extends SparkSpec {
  import Mutators._
  import spark.implicits._

  /** 300 arbitrary printable-ish strings, deterministic sample. */
  private val samples: Seq[String] = {
    val gen = Gen.listOfN(300,
      Gen.chooseNum(0, 24).flatMap(n =>
        Gen.stringOfN(n, Gen.frequency(
          8 -> Gen.alphaNumChar,
          2 -> Gen.oneOf(' ', '-', 'ä', 'ß', '!', '.')))))
    gen(Gen.Parameters.default, Seed(727L)).get
  }

  private def frame(vals: Seq[String]): DataFrame =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF(Gecko.RowId, "v")

  private def run(m: graft.mut.Mutator): Seq[(String, String)] = {
    val df = frame(samples)
    val out = m(df, Seq("v"), 1.0, col(Gecko.RowId))
    samples.zip(out.orderBy(Gecko.RowId).select("v").collect()
      .map(_.getString(0)))
  }

  test("property: insert adds exactly one charset char at any position") {
    run(WithInsert("xq", seed = 1)).foreach { case (a, b) =>
      assert(b.length == a.length + 1, s"'$a' -> '$b'")
      val diffAt = (0 until b.length).find(i =>
        "xq".contains(b(i)) && b.take(i) + b.drop(i + 1) == a)
      assert(diffAt.isDefined, s"'$a' -> '$b'")
    }
  }

  test("property: delete removes exactly one char (len >= 1)") {
    run(WithDelete(seed = 2)).foreach { case (a, b) =>
      if (a.isEmpty) assert(b.isEmpty)
      else {
        assert(b.length == a.length - 1, s"'$a' -> '$b'")
        // b is a with one char removed
        assert((0 until a.length).exists(i =>
          a.take(i) + a.drop(i + 1) == b), s"'$a' -> '$b'")
      }
    }
  }

  test("property: transpose preserves length and char multiset " +
    "(len >= 2)") {
    run(WithTranspose(seed = 3)).foreach { case (a, b) =>
      assert(b.length == a.length, s"'$a' -> '$b'")
      assert(a.sorted == b.sorted, s"'$a' -> '$b'")
      if (a.length < 2) assert(a == b)
      else {
        // differs only by one adjacent swap (or not at all for equal
        // adjacent chars)
        val diffs = a.indices.filter(i => a(i) != b(i))
        assert(diffs.isEmpty ||
          (diffs.length == 2 && diffs(1) == diffs(0) + 1 &&
            a(diffs(0)) == b(diffs(1)) && a(diffs(1)) == b(diffs(0))),
          s"'$a' -> '$b'")
      }
    }
  }

  test("property: substitute preserves length, changes at most one " +
    "position to a charset char (len >= 1)") {
    run(WithSubstitute("#", seed = 4)).foreach { case (a, b) =>
      assert(b.length == a.length, s"'$a' -> '$b'")
      if (a.nonEmpty) {
        val diffs = a.indices.filter(i => a(i) != b(i))
        // '#' never occurs in the samples, so exactly one char changes
        assert(diffs.length == 1, s"'$a' -> '$b'")
        diffs.foreach(i => assert(b(i) == '#', s"'$a' -> '$b'"))
      }
    }
  }

  test("property: insert then delete restores original length") {
    val df = frame(samples)
    val out = graft.mut.MutateDataFrame(df, Seq(
      (Seq("v"), Seq(
        (1.0, WithInsert(seed = 5): graft.mut.Mutator),
        (1.0, WithDelete(seed = 6): graft.mut.Mutator)))))
    samples.zip(out.orderBy(Gecko.RowId).select("v").collect()
      .map(_.getString(0))).foreach { case (a, b) =>
      assert(b.length == a.length, s"'$a' -> '$b'")
    }
  }
}
