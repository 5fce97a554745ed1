package graft

import org.apache.spark.sql.functions._
import graft.core.{Gecko, Strftime}
import graft.gen.{Generators, ToDataFrame}

/** Mirrors the reference's per-operator generator invariants
  * (tests/test_generator.py): value-set membership, statistical
  * tolerances, joint-distribution consistency, exact mixture counts —
  * plus the Spark-specific partition-invariance reproducibility
  * contract. */
class GeneratorSpec extends SparkSpec {
  import Generators._

  private val N = 20000L

  test("fromUniformDistribution: range, precision, determinism") {
    val g = FromUniformDistribution(low = 2.0, high = 5.0, precision = 3,
      seed = 727)
    val vals = g.generate(spark, N).select("c0").collect().map(_.getString(0))
    assert(vals.length == N)
    assert(vals.forall(_.matches("""\d+\.\d{3}""")))
    val ds = vals.map(_.toDouble)
    // upper bound inclusive: u→1 rounds to the boundary at the output
    // precision, exactly as the reference's string formatting does
    assert(ds.forall(d => d >= 2.0 && d <= 5.0))
    val mean = ds.sum / ds.length
    assert(math.abs(mean - 3.5) < 0.05, s"mean $mean")
  }

  test("fromNormalDistribution: moments") {
    val g = FromNormalDistribution(mean = 10.0, sd = 2.0, precision = 4,
      seed = 727)
    val ds = g.generate(spark, N).select("c0").collect()
      .map(_.getString(0).toDouble)
    val mean = ds.sum / ds.length
    val sd = math.sqrt(ds.map(d => (d - mean) * (d - mean)).sum / ds.length)
    assert(math.abs(mean - 10.0) < 0.1, s"mean $mean")
    assert(math.abs(sd - 2.0) < 0.1, s"sd $sd")
  }

  test("fromFrequencyTable: relative frequencies within tolerance") {
    import spark.implicits._
    val freq = Seq(("apple", 50), ("banana", 30), ("cherry", 20))
      .toDF("value", "count")
    val g = fromFrequencyTable(spark, freq, "value", "count", seed = 727)
    val counts = g.generate(spark, N).groupBy("c0").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("apple", "banana", "cherry"))
    assert(math.abs(counts("apple") / N.toDouble - 0.5) < 0.02)
    assert(math.abs(counts("banana") / N.toDouble - 0.3) < 0.02)
    assert(math.abs(counts("cherry") / N.toDouble - 0.2) < 0.02)
  }

  test("fromFrequencyTable: rejects non-integer freq column") {
    import spark.implicits._
    val bad = Seq(("a", 0.5)).toDF("value", "freq")
    val e = intercept[IllegalArgumentException] {
      fromFrequencyTable(spark, bad, "value", "freq", seed = 1)
    }
    assert(e.getMessage.contains("integer type"))
  }

  test("fromFrequencyTable: CSV path with header-name refs and " +
    "positional no-header/TSV refs") {
    def asset(n: String) = getClass.getResource(s"/assets/$n").getPath
    // named refs => header row assumed (reference: generator.py:150)
    val gNamed = fromFrequencyTable(spark, asset("freq_table_header.csv"),
      Right("value"), Right("freq"), ",", seed = 7)
    val vals = gNamed.generate(spark, 500).select("c0").collect()
      .map(_.getString(0)).toSet
    assert(vals == Set("foo", "bar"))
    // positional refs => no header; tab delimiter override
    val gPos = fromFrequencyTable(spark, asset("freq_table_no_header.tsv"),
      Left(0), Left(1), "\t", seed = 8)
    val vals2 = gPos.generate(spark, 500).select("c0").collect()
      .map(_.getString(0)).toSet
    assert(vals2 == Set("foo", "bar"))
    // mixed refs rejected
    intercept[IllegalArgumentException] {
      fromFrequencyTable(spark, asset("freq_table_header.csv"),
        Right("value"), Left(1), ",", seed = 9)
    }
  }

  test("fromFrequencyTable: CSV encoding honored (latin-1 umlauts, " +
    "reference generator.py:116)") {
    def asset(n: String) = getClass.getResource(s"/assets/$n").getPath
    val g = fromFrequencyTable(spark, asset("freq_table_latin1.csv"),
      Right("value"), Right("freq"), ",", seed = 10,
      encoding = "ISO-8859-1")
    val vals = g.generate(spark, 300).select("c0").collect()
      .map(_.getString(0)).toSet
    assert(vals == Set("müller", "mädchen"))
    // reading the same file as UTF-8 mangles the umlauts
    val bad = fromFrequencyTable(spark, asset("freq_table_latin1.csv"),
      Right("value"), Right("freq"), ",", seed = 10)
    val badVals = bad.generate(spark, 300).select("c0").collect()
      .map(_.getString(0)).toSet
    assert(badVals != Set("müller", "mädchen"))
  }

  test("fromFrequencyTable: output independent of lookup-table " +
    "partition layout") {
    import spark.implicits._
    val base = Seq(("a", 3), ("b", 2), ("c", 5), ("d", 7), ("e", 1))
      .toDF("v", "n")
    def run(freqDf: org.apache.spark.sql.DataFrame): Array[String] =
      fromFrequencyTable(spark, freqDf, "v", "n", seed = 55)
        .generate(spark, 2000).orderBy(Gecko.RowId)
        .select("c0").collect().map(_.getString(0))
    // different physical layouts of the SAME table must not remap the
    // cumulative-probability array
    assert(run(base.repartition(1)).sameElements(
      run(base.repartition(5).sortWithinPartitions("n"))))
  }

  test("fromMulticolumnFrequencyTable: joint consistency") {
    import spark.implicits._
    // fruit and color are perfectly correlated in the source table;
    // sampled rows must preserve the pairing (reference:
    // tests/test_generator.py:113-124)
    val freq = Seq(("apple", "red", 60), ("banana", "yellow", 40))
      .toDF("fruit", "color", "n")
    val g = fromMulticolumnFrequencyTable(spark, freq,
      Seq("fruit", "color"), "n", seed = 727)
    assert(g.arity == 2)
    val pairs = g.generate(spark, N).select("c0", "c1").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("apple", "red"), ("banana", "yellow")))
  }

  test("fromDatetimeRange: bounds, format, unit granularity") {
    val g = FromDatetimeRange("2020-01-01", "2020-12-31", "%Y-%m-%d", "d",
      seed = 727)
    val vals = g.generate(spark, 5000).select("c0").collect()
      .map(_.getString(0))
    assert(vals.forall(_.matches("""2020-\d{2}-\d{2}""")))
    assert(vals.contains("2020-01-01"))
    assert(vals.contains("2020-12-31")) // endpoint inclusive
  }

  test("fromDatetimeRange: rejects inverted range and bad unit") {
    intercept[IllegalArgumentException] {
      FromDatetimeRange("2021-01-01", "2020-01-01", "%Y-%m-%d", "d", 1)
    }
    val e = intercept[IllegalArgumentException] {
      FromDatetimeRange("2020-01-01", "2021-01-01", "%Y-%m-%d", "months", 1)
    }
    assert(e.getMessage.contains("unrecognized unit"))
  }

  test("strftime translation: supported subset + loud rejection") {
    assert(Strftime.toJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Strftime.toJava("%d.%m.%Y %H:%M:%S") == "dd.MM.yyyy HH:mm:ss")
    assert(Strftime.toJava("%Y-%m-%dT%H") == "yyyy-MM-dd'T'HH")
    assert(Strftime.toJava("%H:%M:%S.%f") == "HH:mm:ss.SSSSSS")
    assert(Strftime.toJava("100%%") == "100%")
    val e = intercept[IllegalArgumentException](Strftime.toJava("%Q"))
    assert(e.getMessage.contains("unsupported strftime code"))
  }

  test("fromGroup: exact mixture counts with rounding adjustment") {
    val g1 = FromUniformDistribution(0, 1, 6, seed = 1)
    val g2 = FromNormalDistribution(0, 1, 6, seed = 2)
    val grp = FromGroup(Seq((1.0 / 3, g1), (1.0 / 3, g2), (1.0 / 3, g1)),
      maxRoundingAdjustment = 1, seed = 3)
    assert(grp.countsFor(10000).sum == 10000)
    // 10 * 1/3 rounds to 3+3+3 = 9, needs a +1 adjustment
    assert(grp.countsFor(10).sum == 10)
    val noAdj = FromGroup(Seq((1.0 / 3, g1), (1.0 / 3, g2), (1.0 / 3, g1)),
      maxRoundingAdjustment = 0, seed = 3)
    val e = intercept[IllegalArgumentException](noAdj.countsFor(10))
    assert(e.getMessage.contains("rounding"))
  }

  test("fromGroup: mixture proportions + row ids unique") {
    import spark.implicits._
    val ga = fromFrequencyTable(spark,
      Seq(("a", 1)).toDF("v", "n"), "v", "n", seed = 1)
    val gb = fromFrequencyTable(spark,
      Seq(("b", 1)).toDF("v", "n"), "v", "n", seed = 2)
    val grp = FromGroup(Seq((0.7, ga), (0.3, gb)), 1, seed = 3)
    val df = grp.generate(spark, 10000)
    val counts = df.groupBy("c0").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 7000L && counts("b") == 3000L) // exact, not sampled
    assert(df.select(Gecko.RowId).distinct().count() == 10000L)
    // the shuffle must remix the id↔generator association (reference
    // generator.py:415-419): an id-ordered prefix shows a mixture, not
    // a contiguous block from the first generator
    val head = df.orderBy(Gecko.RowId).limit(1000).select("c0")
      .collect().map(_.getString(0))
    val aFrac = head.count(_ == "a") / 1000.0
    assert(aFrac > 0.6 && aFrac < 0.8, s"head not mixed: aFrac=$aFrac")
    // and row ids are the contiguous range 0..n-1 after renumbering
    assert(df.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col(Gecko.RowId))).head.getLong(0)
      == 9999L)
  }

  test("toDataFrame: fused plan, arity check, duplicate names") {
    import spark.implicits._
    val freq = Seq(("x", 1), ("y", 1)).toDF("v", "n")
    val spec = Seq(
      (Seq("cat"), fromFrequencyTable(spark, freq, "v", "n", seed = 1)),
      (Seq("num"), FromUniformDistribution(0, 1, 6, seed = 2)))
    val df = ToDataFrame(spark, spec, 1000)
    assert(df.columns.toSeq == Seq(Gecko.RowId, "cat", "num"))
    assert(df.count() == 1000)
    // fused path must not shuffle: single range scan, no Exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

    intercept[IllegalArgumentException] {
      ToDataFrame(spark, Seq((Seq("a", "b"),
        FromUniformDistribution(0, 1, 6, seed = 1))), 10)
    }
    intercept[IllegalArgumentException] {
      ToDataFrame(spark, Seq(
        (Seq("a"), FromUniformDistribution(0, 1, 6, seed = 1)),
        (Seq("a"), FromUniformDistribution(0, 1, 6, seed = 2))), 10)
    }
  }

  test("reproducibility: byte-identical across partition counts") {
    import spark.implicits._
    val freq = Seq(("a", 3), ("b", 2), ("c", 5)).toDF("v", "n")
    val spec = Seq(
      (Seq("cat"), fromFrequencyTable(spark, freq, "v", "n", seed = 42)),
      (Seq("u"), FromUniformDistribution(0, 1, 6, seed = 43)),
      (Seq("dt"), FromDatetimeRange("1990-01-01", "2000-01-01",
        "%Y-%m-%d", "d", seed = 44)))
    def run(parts: Int): Array[String] =
      ToDataFrame(spark, spec, 5000).repartition(parts)
        .orderBy(Gecko.RowId)
        .select(concat_ws("|", col("cat"), col("u"), col("dt")))
        .collect().map(_.getString(0))
    assert(run(1).sameElements(run(8)))
  }
}
