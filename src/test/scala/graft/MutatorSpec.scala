package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Gecko, Warnings}
import graft.gen.Generators
import graft.mut.{MutateDataFrame, Mutators}

/** Mirrors the reference's per-operator mutator invariants
  * (tests/test_mutator.py): length preserved, all/some/none changed,
  * partial-p behavior, warning contract, eligibility rules. */
class MutatorSpec extends SparkSpec {
  import Mutators._
  import spark.implicits._

  private def frame(vals: Seq[String]): DataFrame =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF(Gecko.RowId, "v")

  private def namesDf(n: Int): DataFrame = {
    val pool = Seq("alice", "BOB", "charlie", "Dora", "emil", "frida")
    frame((0 until n).map(i => pool(i % pool.size) + i))
  }

  private def collectV(df: DataFrame): Array[String] =
    df.orderBy(Gecko.RowId).select("v").collect().map(_.getString(0))

  private def changedCount(before: DataFrame, after: DataFrame): Int =
    collectV(before).zip(collectV(after)).count { case (a, b) => a != b }

  test("withMissingValue: p=1 overwrites all, sentinel rows ineligible") {
    val df = frame(Seq("a", "b", "", "c"))
    val out = WithMissingValue("", seed = 1)(df, Seq("v"), 1.0, col(Gecko.RowId))
    assert(collectV(out).forall(_ == ""))
  }

  test("withMissingValue: warns when p unattainable") {
    Warnings.drain()
    val df = frame(Seq("", "", "", "x"))
    WithMissingValue("", seed = 1)(df, Seq("v"), 1.0, col(Gecko.RowId))
      .collect()
    val w = Warnings.drain()
    assert(w.exists(_.contains("desired probability of 1.0 cannot be met")))
  }

  test("withInsert: p=1 inserts exactly one charset char everywhere") {
    val df = namesDf(500)
    val out = WithInsert("xyz", seed = 7)(df, Seq("v"), 1.0, col(Gecko.RowId))
    val pairs = collectV(df).zip(collectV(out))
    assert(pairs.forall { case (a, b) => b.length == a.length + 1 })
    // removing the inserted char restores the original
    assert(pairs.forall { case (a, b) =>
      (0 until b.length).exists(i =>
        "xyz".contains(b(i)) && (b.take(i) + b.drop(i + 1)) == a)
    })
  }

  test("withDelete: p=1 removes exactly one char; empty rows ineligible") {
    val df = frame(Seq("ab", "x", "", "hello"))
    Warnings.drain()
    val out = WithDelete(seed = 7)(df, Seq("v"), 1.0, col(Gecko.RowId))
    val got = collectV(out)
    assert(got(0).length == 1 && got(1).isEmpty && got(2).isEmpty &&
      got(3).length == 4)
    assert(Warnings.drain().nonEmpty) // empty row made p=1 unattainable
  }

  test("withTranspose: p=1 swaps adjacent chars, multiset preserved") {
    val df = namesDf(300)
    val out = WithTranspose(seed = 7)(df, Seq("v"), 1.0, col(Gecko.RowId))
    val pairs = collectV(df).zip(collectV(out))
    assert(pairs.forall { case (a, b) =>
      a.length == b.length && a.sorted == b.sorted
    })
    assert(pairs.count { case (a, b) => a != b } > 250)
  }

  test("withSubstitute: p=1 replaces one char from charset") {
    val df = namesDf(300)
    val out = WithSubstitute("#!", seed = 7)(df, Seq("v"), 1.0,
      col(Gecko.RowId))
    val pairs = collectV(df).zip(collectV(out))
    assert(pairs.forall { case (a, b) => a.length == b.length })
    assert(pairs.forall { case (_, b) =>
      b.exists(ch => ch == '#' || ch == '!')
    })
  }

  test("partial p: roughly half mutated, some unchanged") {
    val df = namesDf(2000)
    val out = WithInsert(seed = 11)(df, Seq("v"), 0.5, col(Gecko.RowId))
    val changed = changedCount(df, out)
    assert(changed > 850 && changed < 1150, s"changed=$changed")
  }

  test("withNoop: identity") {
    val df = namesDf(50)
    assert(collectV(WithNoop()(df, Seq("v"), 1.0, col(Gecko.RowId)))
      .sameElements(collectV(df)))
  }

  test("withCategoricalValues: always replaces with a different member") {
    val cats = Seq("red", "green", "blue")
    val df = frame(Seq("red", "green", "blue", "red", "purple"))
    val out = WithCategoricalValues(cats, seed = 5)(df, Seq("v"), 1.0,
      col(Gecko.RowId))
    val got = collectV(out)
    val orig = collectV(df)
    (0 until 4).foreach { i =>
      assert(cats.contains(got(i)) && got(i) != orig(i),
        s"row $i: ${orig(i)} -> ${got(i)}")
    }
    assert(got(4) == "purple") // not in set => ineligible
  }

  test("withCategoricalValues: requires two uniques") {
    val e = intercept[IllegalArgumentException] {
      WithCategoricalValues(Seq("only", "only"), seed = 1)
    }
    assert(e.getMessage.contains("two unique"))
  }

  test("withPermute: derangement — no value stays in its column") {
    val n = 500
    val df = (0 until n).map(i => (i.toLong, s"a$i", s"b$i", s"c$i"))
      .toDF(Gecko.RowId, "x", "y", "z")
    val out = WithPermute(seed = 9)(df, Seq("x", "y", "z"), 1.0,
      col(Gecko.RowId))
    out.orderBy(Gecko.RowId).collect().zipWithIndex.foreach { case (r, i) =>
      val (x, y, z) = (r.getString(1), r.getString(2), r.getString(3))
      assert(x != s"a$i" && y != s"b$i" && z != s"c$i")
      assert(Set(x, y, z).map(_.head) == Set('a', 'b', 'c'))
      assert(Seq(x, y, z).forall(_.drop(1) == i.toString))
    }
    intercept[IllegalArgumentException] {
      WithPermute(seed = 9)(df, Seq("x"), 1.0, col(Gecko.RowId))
    }
  }

  test("withPermute: rejects > 7 columns loudly (factorial " +
    "derangement bound) and still accepts 7") {
    val names = (0 until 8).map(i => s"c$i")
    val row = (0L +: names.map(n => s"v$n")).toArray
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(row: _*)),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(Gecko.RowId,
          org.apache.spark.sql.types.LongType) +:
        names.map(n => org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.StringType))))
    val e = intercept[IllegalArgumentException] {
      WithPermute(seed = 9)(df, names, 1.0, col(Gecko.RowId))
    }
    assert(e.getMessage.contains("at most 7"))
    // a width inside the bound still plans and executes
    val ok = WithPermute(seed = 9)(df, names.take(6), 1.0,
      col(Gecko.RowId)).collect()
    assert(ok.length == 1)
  }

  test("withLowercase / withUppercase") {
    val df = frame(Seq("ABC", "abc", "MiXeD", "123"))
    val lo = collectV(WithLowercase(seed = 3)(df, Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(lo(0) == "abc" && lo(1) == "abc" && lo(2) == "mixed" &&
      lo(3) == "123")
    val up = collectV(WithUppercase(seed = 3)(df, Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(up(0) == "ABC" && up(2) == "MIXED")
  }

  test("withDatetimeOffset: shifts within bounds, format preserved") {
    val df = frame(Seq("15.06.2001", "01.01.1999", "28.02.2000"))
    val out = WithDatetimeOffset(5, "d", "%d.%m.%Y", preventWraparound = false,
      seed = 13)(df, Seq("v"), 1.0, col(Gecko.RowId))
    val fmt = java.time.format.DateTimeFormatter.ofPattern("dd.MM.yyyy")
    collectV(df).zip(collectV(out)).foreach { case (a, b) =>
      val (da, db) = (java.time.LocalDate.parse(a, fmt),
        java.time.LocalDate.parse(b, fmt))
      val diff = math.abs(java.time.temporal.ChronoUnit.DAYS.between(da, db))
      assert(diff >= 1 && diff <= 5, s"$a -> $b")
    }
  }

  test("withLowercase/withUppercase: eligibility counts only case-changing " +
    "rows — intentional deviation from gecko's ~islower() " +
    "(mutator.py:1142, :1186)") {
    // gecko counts caseless (digit-only) strings as eligible and then
    // "mutates" them as no-ops, silently dropping the realized change
    // rate below p on digit-heavy columns. This engine's predicate
    // (c =!= lower(c)) keeps the realized rate at p and surfaces the
    // shortfall as an explicit p-unmet warning instead.
    Warnings.drain()
    val df = frame(Seq("AbC", "DeF", "123", "456"))
    val out = collectV(WithLowercase(seed = 16)(df, Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(out.sameElements(Array("abc", "def", "123", "456")))
    assert(Warnings.drain().exists(_.startsWith(
      "with_lowercase: desired probability of 1.0 cannot be met since " +
        "percentage of rows that could possibly be mutated is 0.5")))
    Warnings.drain()
    val up = collectV(WithUppercase(seed = 17)(df, Seq("v"), 0.5,
      col(Gecko.RowId)))
    // selection scaled by 1/pActual: changed fraction over ALL rows ≈ p
    assert(up.zip(Array("AbC", "DeF", "123", "456"))
      .forall { case (b, a) => b == a || b == a.toUpperCase })
  }

  test("withDatetimeOffset: wraparound reverts fire the post-hoc p-unmet " +
    "warning via observe() (mutator.py:1284-1289)") {
    Warnings.drain()
    // Jan 1 + delta in [1,28]: every negative draw wraps into December
    // and is reverted => realized p < 1 on ~half the rows
    val df = frame(Seq.fill(50)("01.01.2000"))
    val out = WithDatetimeOffset(28, "d", "%d.%m.%Y",
      preventWraparound = true, seed = 14)(df, Seq("v"), 1.0,
      col(Gecko.RowId))
    out.collect() // metrics ride this action; listener delivery is async
    val deadline = System.nanoTime() + 5000000000L
    var w = Seq.empty[String]
    while (w.isEmpty && System.nanoTime() < deadline) {
      w = Warnings.drain().filter(_.startsWith(
        "with_datetime_offset: desired probability of 1.0 cannot be met"))
      if (w.isEmpty) Thread.sleep(100)
    }
    assert(w.nonEmpty, "expected a post-hoc wraparound p-unmet warning")

    // mid-month small deltas never wrap => no warning
    Warnings.drain()
    WithDatetimeOffset(3, "d", "%d.%m.%Y", preventWraparound = true,
      seed = 15)(frame(Seq.fill(20)("15.06.2000")), Seq("v"), 1.0,
      col(Gecko.RowId)).collect()
    Thread.sleep(1000)
    assert(!Warnings.drain().exists(_.startsWith("with_datetime_offset")))
  }

  test("withDatetimeOffset: a partial first action (show/limit) does " +
    "not consume the warning — the first full scan still reports it") {
    Warnings.drain()
    val df = frame(Seq.fill(50)("01.01.2000"))
    val out = WithDatetimeOffset(28, "d", "%d.%m.%Y",
      preventWraparound = true, seed = 16)(df, Seq("v"), 1.0,
      col(Gecko.RowId))
    // limit(1): early-terminated scan — its metrics cover ~1 row and
    // must not permanently swallow the pending entry
    out.limit(1).collect()
    Thread.sleep(500) // let the partial action's metrics deliver first
    Warnings.drain()
    out.collect() // full scan: the real shortfall must surface now
    val deadline = System.nanoTime() + 5000000000L
    var w = Seq.empty[String]
    while (w.isEmpty && System.nanoTime() < deadline) {
      w = Warnings.drain().filter(_.startsWith(
        "with_datetime_offset: desired probability of 1.0 cannot be met"))
      if (w.isEmpty) Thread.sleep(100)
    }
    assert(w.nonEmpty,
      "full-scan warning was lost after a partial first action")
    // re-running the identical action must not replay the warning
    out.collect()
    Thread.sleep(1000)
    assert(!Warnings.drain().exists(_.startsWith("with_datetime_offset")))
  }

  test("withDatetimeOffset: preventWraparound keeps month stable") {
    val df = frame(Seq("01.07.2001", "31.01.2000", "15.06.1999"))
    val out = WithDatetimeOffset(3, "d", "%d.%m.%Y", preventWraparound = true,
      seed = 13)(df, Seq("v"), 1.0, col(Gecko.RowId))
    collectV(df).zip(collectV(out)).foreach { case (a, b) =>
      assert(a.substring(3) == b.substring(3), s"$a -> $b") // month+year fixed
    }
  }

  test("withGenerator: append/prepend/replace with {} placeholder") {
    val df = frame(Seq("one", "two", "three"))
    val gen = Generators.FromUniformDistribution(0, 1, 2, seed = 21)
    val app = collectV(WithGenerator(gen, "append", " (${})",
      seed = 22)(df, Seq("v"), 1.0, col(Gecko.RowId)))
    // joinWith "(${})" => before=" ($", after=")"
    assert(app.forall(_.matches("""\w+ \(\$0\.\d{2}\)""")), app.mkString(","))
    val rep = collectV(WithGenerator(gen, "replace",
      seed = 23)(df, Seq("v"), 1.0, col(Gecko.RowId)))
    assert(rep.forall(_.matches("""0\.\d{2}""")))
    val pre = collectV(WithGenerator(gen, "prepend", "-",
      seed = 24)(df, Seq("v"), 1.0, col(Gecko.RowId)))
    assert(pre.forall(_.matches("""0\.\d{2}-\w+""")))
  }

  test("withRepeat: duplicates with join string") {
    val df = frame(Seq("ha", "no"))
    val out = collectV(WithRepeat(" ", seed = 4)(df, Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(out(0) == "ha ha" && out(1) == "no no")
  }

  test("withGroup: mutually exclusive application, weights respected") {
    val df = namesDf(4000)
    val grp = WithGroup(Seq(
      (0.5, WithRepeat("+", seed = 31)),
      (0.3, WithMissingValue("GONE", seed = 32))), seed = 30)
    val out = grp(df, Seq("v"), 1.0, col(Gecko.RowId))
    val got = collectV(out)
    val orig = collectV(df)
    val repeated = got.count(_.contains("+"))
    val gone = got.count(_ == "GONE")
    val untouched = got.zip(orig).count { case (b, a) => a == b }
    assert(math.abs(repeated / 4000.0 - 0.5) < 0.05, s"repeated=$repeated")
    assert(math.abs(gone / 4000.0 - 0.3) < 0.05, s"gone=$gone")
    assert(math.abs(untouched / 4000.0 - 0.2) < 0.05, s"untouched=$untouched")
  }

  test("withGroup: weight validation") {
    intercept[IllegalArgumentException] {
      WithGroup(Seq((0.9, WithNoop()), (0.2, WithNoop())), seed = 1)
    }
  }

  test("mutateDataFrame: sequential fold, later mutators see earlier output") {
    val df = frame(Seq("aaa", "bbb"))
    val out = MutateDataFrame(df, Seq(
      (Seq("v"), Seq(
        (1.0, WithRepeat("-", seed = 41)),
        (1.0, WithUppercase(seed = 42))))))
    val got = collectV(out)
    assert(got(0) == "AAA-AAA" && got(1) == "BBB-BBB")
    intercept[IllegalArgumentException] {
      MutateDataFrame(df, Seq((Seq("nope"),
        Seq((1.0, WithNoop(): graft.mut.Mutator)))))
    }
    intercept[IllegalArgumentException] {
      MutateDataFrame(df, Seq((Seq("v"),
        Seq((0.0, WithNoop(): graft.mut.Mutator)))))
    }
  }

  test("mutateDataFrame.of: reference spec forms normalize like " +
    "mutator.py:1749-1777") {
    val df = frame(Seq("aaa", "bbb"))
    // bare mutator => p=1; (p, m) pair; unweighted list => each p=1
    val bare = MutateDataFrame.of(df, "v" -> WithUppercase(seed = 81))
    assert(collectV(bare).sameElements(Array("AAA", "BBB")))
    val listed = MutateDataFrame.of(df,
      "v" -> Seq[graft.mut.Mutator](WithRepeat("-", seed = 82),
        WithUppercase(seed = 83)))
    assert(collectV(listed).sameElements(Array("AAA-AAA", "BBB-BBB")))
    val pair = MutateDataFrame.of(df, "v" -> (1.0 -> (WithMissingValue("?",
      seed = 84): graft.mut.Mutator)))
    assert(collectV(pair).forall(_ == "?"))
    // multi-column form reaches the same fold as the canonical API
    val multi = MutateDataFrame.of(
      frame(Seq("x")).withColumn("w", col("v")),
      Seq("v", "w") -> WithUppercase(seed = 85))
    val r = multi.select("v", "w").head()
    assert(r.getString(0) == "X" && r.getString(1) == "X")
    // invalid probability still rejected through the flexible path
    intercept[IllegalArgumentException] {
      MutateDataFrame.of(df, "v" -> (0.0 -> (WithNoop(): graft.mut.Mutator)))
    }
  }

  test("p-protocol: realized mutation fraction tracks p across the sweep " +
    "(reference contract, mutator.py:601-616)") {
    val df = namesDf(5000)
    Seq(0.2, 0.5, 0.8).foreach { p =>
      val out = WithInsert(seed = (p * 100).toLong)(df, Seq("v"), p,
        col(Gecko.RowId))
      val changed = changedCount(df, out) / 5000.0
      assert(math.abs(changed - p) < 0.04, s"p=$p realized $changed")
    }
    // eligibility-gated mutator: realized fraction over ALL rows still
    // ≈ p (selection rescaled by 1/pActual); half the rows eligible
    val half = frame((0 until 4000).map(i =>
      if (i % 2 == 0) s"name$i" else ""))
    val out = WithDelete(seed = 9)(half, Seq("v"), 0.4, col(Gecko.RowId))
    val changed = changedCount(half, out) / 4000.0
    assert(math.abs(changed - 0.4) < 0.04, s"realized $changed")
  }

  test("withGenerator: multi-column generator keeps intra-row " +
    "consistency; arity mismatch rejected (mutator.py:1361-1366)") {
    import spark.implicits._
    val joint = Seq(("DE", "EUROPE", 3), ("JP", "ASIA", 2), ("US", "AMERICA", 5))
      .toDF("cc", "region", "n")
    val gen = Generators.fromMulticolumnFrequencyTable(spark, joint,
      Seq("cc", "region"), "n", seed = 71)
    val df = (0L until 300L).map(i => (i, "x", "y"))
      .toDF(Gecko.RowId, "a", "b")
    val out = WithGenerator(gen, "replace", seed = 72)(
      df, Seq("a", "b"), 1.0, col(Gecko.RowId))
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1)))
    val valid = Set(("DE", "EUROPE"), ("JP", "ASIA"), ("US", "AMERICA"))
    assert(out.forall(valid.contains), "row tore a joint sample apart")
    assert(out.distinct.length > 1)
    // arity 2 generator on 1 column => reference error contract
    val e = intercept[IllegalArgumentException] {
      WithGenerator(gen, "replace", seed = 73)(df, Seq("a"), 1.0,
        col(Gecko.RowId))
    }
    assert(e.getMessage.contains("as many series"))
  }

  test("mutators: byte-identical across partition counts") {
    val df = namesDf(3000)
    def run(parts: Int): Array[String] = {
      val d = df.repartition(parts)
      val out = MutateDataFrame(d, Seq(
        (Seq("v"), Seq(
          (0.4, WithInsert(seed = 51): graft.mut.Mutator),
          (0.4, WithDelete(seed = 52): graft.mut.Mutator),
          (0.3, WithSubstitute(seed = 53): graft.mut.Mutator)))))
      collectV(out)
    }
    assert(run(1).sameElements(run(7)))
  }

  test("withFunction: custom scalar fn") {
    val df = frame(Seq("ab", "cd"))
    val out = collectV(WithFunction(s => s.reverse, seed = 6)(
      df, Seq("v"), 1.0, col(Gecko.RowId)))
    assert(out(0) == "ba" && out(1) == "dc")
  }

  /** Counts eager Spark SQL actions (one SQLExecutionStart per
    * .head()/.collect()); scheduler jobs would over-count under AQE,
    * which runs each shuffle stage as its own job. */
  private def countExecutions(body: => Unit): Int = {
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case _: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execs.incrementAndGet(); ()
        case _ => ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener bus is async — give it a moment to drain
      Thread.sleep(500)
      execs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("mutateDataFrame: chained spec fuses all p-protocol stats into one job") {
    val df = namesDf(500)
    df.count() // warm the lineage so only the stats pass is counted below
    val n = countExecutions {
      // four eligibility-bearing mutators, incl. M4 whose rule-order
      // counts also must ride the fused agg
      val ocr = graft.mut.RuleMutators.WithReplacementTable(
        Seq(("a", "4"), ("e", "3"), ("o", "0")), inline = true,
        reverse = false, seed = 61)
      MutateDataFrame(df, Seq(
        (Seq("v"), Seq(
          (0.4, WithDelete(seed = 62): graft.mut.Mutator),
          (0.3, WithLowercase(seed = 63): graft.mut.Mutator),
          (0.3, ocr: graft.mut.Mutator))),
        (Seq("v"), Seq(
          (0.2, WithMissingValue("?", seed = 64): graft.mut.Mutator)))))
    }
    assert(n == 1, s"expected exactly 1 fused stats pass, saw $n")
  }

  test("mutateDataFrame: eligibility created by an earlier mutator is " +
    "re-detected (snapshot-zero safety valve)") {
    // all-lowercase input: uppercase first, then lowercase. The fused
    // snapshot sees zero lowercase-eligible rows; the safety valve must
    // recompute on the running frame instead of disabling the mutator.
    Warnings.drain()
    val df = frame(Seq("aaa", "bbb", "ccc"))
    val out = MutateDataFrame(df, Seq(
      (Seq("v"), Seq(
        (1.0, WithUppercase(seed = 91): graft.mut.Mutator),
        (1.0, WithLowercase(seed = 92): graft.mut.Mutator)))))
    assert(collectV(out).sameElements(Array("aaa", "bbb", "ccc")))
    // and no bogus p-unmet warning from the stale snapshot
    assert(!Warnings.drain().exists(_.startsWith("with_lowercase")))
  }

  test("mutateDataFrame: stats-free spec runs zero jobs at plan time") {
    val df = namesDf(100)
    df.count()
    val n = countExecutions {
      MutateDataFrame(df, Seq(
        (Seq("v"), Seq(
          (0.5, WithInsert(seed = 71): graft.mut.Mutator),
          (0.5, WithRepeat("-", seed = 72): graft.mut.Mutator)))))
    }
    assert(n == 0, s"expected no stats pass for stats-free mutators, saw $n")
  }
}
