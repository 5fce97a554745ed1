package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{Gecko, Warnings}
import graft.gen.Generators
import graft.mut.{Mutators, RuleMutators}

/** 1:1 ports of the reference's parametrized test matrix that the
  * invariant suites don't already mirror — charset restrictions,
  * reverse×inline combinations, flag matrices, exact warning-message
  * prefixes, and the G4/G5 CSV input matrix. Each test cites the
  * reference case it ports (tests/test_mutator.py /
  * tests/test_generator.py). */
class ReferenceMatrixSpec extends SparkSpec {
  import Mutators._
  import RuleMutators._
  import spark.implicits._

  private def frame(vals: Seq[String]): DataFrame =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF(Gecko.RowId, "v")

  private def collectV(df: DataFrame): Array[String] =
    df.orderBy(Gecko.RowId).select("v").collect().map(_.getString(0))

  /** Deterministic analog of the reference's random_strings fixture. */
  private def randomStrings(n: Int = 100, len: Int = 20,
                            charset: String =
                              "abcdefghijklmnopqrstuvwxyz0123456789",
                            seed: Int = 7, unique: Boolean = false)
      : Seq[String] = {
    val r = new scala.util.Random(seed)
    def one(): String =
      if (unique) r.shuffle(charset.toList).take(len).mkString
      else Seq.fill(len)(charset(r.nextInt(charset.length))).mkString
    Seq.fill(n)(one())
  }

  private def expectWarning(prefix: String)(body: => Unit): Unit = {
    Warnings.drain()
    body
    val ws = Warnings.drain()
    assert(ws.exists(_.startsWith(prefix)),
      s"expected warning starting with `$prefix`, got: ${ws.mkString("; ")}")
  }

  // -------------------------------------------------------------- M2
  test("keymap: repeated value yields multiple typo variants " +
    "(test_with_cldr_keymap_file_multiple_options :31-39)") {
    val m = WithCldrKeymap(graft.mut.Cldr.neighborCandidates(
      getClass.getResourceAsStream("/assets/de-t-k0-windows.xml"), None),
      seed = 902)
    val got = collectV(m(frame(Seq.fill(100)("foobar")), Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(got.forall(_.length == 6))
    assert(got.distinct.length > 1)
  }

  // -------------------------------------------------------------- M4
  test("replacementTable: multi-target source draws varied targets " +
    "(test_with_replacement_table_random_values :114-131)") {
    val table = Seq(("a", "0"), ("a", "1"), ("a", "2")).toDF("s", "t")
    val m = WithReplacementTable(table, "s", "t", inline = true,
      reverse = false, seed = 904)
    val got = collectV(m(frame(Seq.fill(1000)("aaa")), Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(got.forall(_ != "aaa"))
    assert(got.distinct.length > 1)
  }

  test("replacementTable: lowercase<->uppercase reverse matrix " +
    "(test_with_replacement_table_reverse :165-183)") {
    val lower = ('a' to 'z').map(_.toString)
    val upper = ('A' to 'Z').map(_.toString)
    val table = lower.zip(upper).toDF("s", "t")
    val m = WithReplacementTable(table, "s", "t", inline = false,
      reverse = true, seed = 905)
    val got = collectV(m(frame(lower ++ upper), Seq("v"), 1.0,
      col(Gecko.RowId)))
    // every single-char value flips case in both directions
    assert(got.take(26).toSeq == upper)
    assert(got.drop(26).toSeq == lower)
  }

  test("replacementTable: inline char map keeps length, changes all " +
    "(test_with_replacement_table_inline :186-204)") {
    val lower = ('a' to 'z').map(_.toString)
    val upper = ('A' to 'Z').map(_.toString)
    val table = lower.zip(upper).toDF("s", "t")
    val m = WithReplacementTable(table, "s", "t", inline = true,
      reverse = false, seed = 906)
    val in = randomStrings(charset = "abcdefghijklmnopqrstuvwxyz",
      len = 10, seed = 11)
    val got = collectV(m(frame(in), Seq("v"), 1.0, col(Gecko.RowId)))
    assert(got.zip(in).forall { case (o, i) => o != i && o.length == 10 })
  }

  test("replacementTable: exact warning prefix at unattainable p " +
    "(test_with_replacement_table_warn_p :207-224)") {
    val table = Seq(("a", "A")).toDF("s", "t")
    val m = WithReplacementTable(table, "s", "t", inline = false,
      reverse = false, seed = 907)
    val in = Seq.fill(50)("a") ++ Seq.fill(50)("b")
    expectWarning(
      "with_replacement_table: desired probability of 0.8 cannot be met") {
      val got = collectV(m(frame(in), Seq("v"), 0.8, col(Gecko.RowId)))
      assert(got.take(50).forall(_ == "A"))
      assert(got.drop(50).forall(_ == "b"))
    }
  }

  // -------------------------------------------------------------- M3
  test("phonetic: full source/target/flags matrix on abc permutations " +
    "(test_with_phonetic_replacement_table :969-986)") {
    val rules = "abcbcca".zip("0123456").zip("^^^$$__").map {
      case ((s, t), f) => (s.toString, t.toString, f.toString)
    }
    val m = WithPhoneticReplacementTable(rules, seed = 908)
    val in = "abc".permutations.map(identity).toSeq.sorted
    val got = collectV(m(frame(in), Seq("v"), 1.0, col(Gecko.RowId)))
    assert(got.zip(in).forall { case (o, i) => o != i })
    assert(got.forall(_.exists(_.isDigit)))
  }

  test("phonetic: anchor-distinct rules on one value yield exactly " +
    "3 variants (test_with_phonetic_replacement_table_random_values " +
    ":988-1005)") {
    val m = WithPhoneticReplacementTable(Seq(
      ("a", "0", "^"), ("a", "1", "_"), ("a", "2", "$")), seed = 909)
    val got = collectV(m(frame(Seq.fill(1000)("aaa")), Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(got.forall(_ != "aaa"))
    assert(got.distinct.sorted.toSeq == Seq("0aa", "a1a", "aa2"))
  }

  test("phonetic: empty flags enable all three anchors " +
    "(test_with_phonetic_replacement_table_no_flags :1026-1052)") {
    val m = WithPhoneticReplacementTable(Seq(("a", "0", "")), seed = 910)
    val in = randomStrings(charset = "abcdefghijklmnopqrstuvwxyz",
      len = 26, seed = 12, unique = true) // shuffled a-z: 'a' anywhere
    val got = collectV(m(frame(in), Seq("v"), 1.0, col(Gecko.RowId)))
    assert(got.zip(in).forall { case (o, i) => o != i })
    assert(got.forall(_.contains('0')))
  }

  test("phonetic: exact warning prefix + untouched ineligible rows " +
    "(test_with_phonetic_replacement_table_warn_p :1079-1104)") {
    val m = WithPhoneticReplacementTable(Seq(("a", "0", "^")), seed = 911)
    val in = Seq.fill(100)(Seq("abc", "def")).flatten
    expectWarning("with_phonetic_replacement_table: desired probability " +
      "of 0.8 cannot be met") {
      val got = collectV(m(frame(in), Seq("v"), 0.8, col(Gecko.RowId)))
      got.zip(in).foreach { case (o, i) =>
        if (i == "abc") assert(o == "0bc") else assert(o == "def")
      }
    }
  }

  // ------------------------------------------------------------- M17
  test("regex: disjoint patterns rewrite every row deterministically " +
    "(test_with_regex_replacement_table_favor_rare_regexes :1137-1146)") {
    val m = WithRegexReplacementTable(Seq(
      ("a(bc)", "", Map("1" -> "1")), ("d(ef)", "", Map("1" -> "2"))),
      seed = 912)
    val in = Seq.fill(100)("abc") ++ Seq.fill(50)("def")
    val got = collectV(m(frame(in), Seq("v"), 1.0, col(Gecko.RowId)))
    assert(got.take(100).forall(_ == "a1"))
    assert(got.drop(100).forall(_ == "d2"))
  }

  test("regex: named-group splice positions (both reference pattern " +
    "sets, test_with_regex_replacement_table_partial :1243-1269)") {
    val patternSets = Seq(
      Seq("""^(?P<value>a).""", """.(?P<value>b).""", """.(?P<value>c)$"""),
      Seq("""^(?P<value>a)\w+""", """\w+(?P<value>b)\w+""",
        """\w+(?P<value>c)$"""))
    patternSets.foreach { pats =>
      val m = WithRegexReplacementTable(
        pats.zip(Seq("0", "1", "2")).map { case (p, t) =>
          (p, "", Map("value" -> t))
        }, seed = 913)
      val got = collectV(m(frame(Seq("aaa", "bbb", "ccc")), Seq("v"), 1.0,
        col(Gecko.RowId)))
      assert(got.toSeq == Seq("0aa", "b1b", "cc2"),
        s"pattern set $pats gave ${got.toSeq}")
    }
  }

  test("regex: identical patterns with different targets draw all 3 " +
    "variants (test_with_regex_replacement_table_random_values " +
    ":1272-1286)") {
    val m = WithRegexReplacementTable(Seq(
      (".(a).", "", Map("1" -> "0")), (".(a).", "", Map("1" -> "1")),
      (".(a).", "", Map("1" -> "2"))), seed = 914)
    val got = collectV(m(frame(Seq.fill(1000)("aaa")), Seq("v"), 1.0,
      col(Gecko.RowId)))
    assert(got.forall(_ != "aaa"))
    assert(got.distinct.sorted.toSeq == Seq("a0a", "a1a", "a2a"))
  }

  test("regex: i-flag matrix mutates both cases " +
    "(test_with_regex_replacement_table_flags :1177-1195)") {
    val m = WithRegexReplacementTable(Seq(
      ("a(bc)", "i", Map("1" -> "1")), ("d(ef)", "i", Map("1" -> "2"))),
      seed = 915)
    val in = Seq.fill(100)(Seq("abc", "def", "ABC", "DEF")).flatten
    val got = collectV(m(frame(in), Seq("v"), 1.0, col(Gecko.RowId)))
    got.zip(in).foreach { case (o, i) =>
      assert(o != i)
      assert(o.exists(_.isDigit))
    }
  }

  test("regex: exact warning prefix at unattainable p " +
    "(test_with_regex_replacement_table_warn_p :1197-1215)") {
    val m = WithRegexReplacementTable(Seq(("a(bc)", "", Map("1" -> "1"))),
      seed = 916)
    val in = Seq.fill(100)(Seq("abc", "def")).flatten
    expectWarning("with_regex_replacement_table: desired probability " +
      "of 0.8 cannot be met") {
      val got = collectV(m(frame(in), Seq("v"), 0.8, col(Gecko.RowId)))
      got.zip(in).foreach { case (o, i) =>
        if (i == "abc") assert(o == "a1") else assert(o == "def")
      }
    }
  }

  // -------------------------------------------------- M6/M7/M8/M9
  test("insert: custom charset lands in the output " +
    "(test_with_insert_charset :307-320)") {
    val in = randomStrings(charset = "abcdefghijklmnopqrstuvwxyz",
      seed = 13)
    val m = WithInsert(charset = ('A' to 'Z').mkString, seed = 917)
    val got = collectV(m(frame(in), Seq("v"), 1.0, col(Gecko.RowId)))
    got.zip(in).foreach { case (o, i) =>
      assert(o.length == i.length + 1)
      assert(o.exists(_.isUpper), s"no uppercase inserted in `$o`")
      assert(o.filterNot(_.isUpper) == i) // everything else preserved
    }
  }

  test("substitute: custom digit charset makes rows alphanumeric " +
    "(test_with_substitute_charset :390-405)") {
    val in = randomStrings(charset = "abcdefghijklmnopqrstuvwxyz",
      seed = 14)
    val m = WithSubstitute(charset = "0123456789", seed = 918)
    val got = collectV(m(frame(in), Seq("v"), 1.0, col(Gecko.RowId)))
    got.zip(in).foreach { case (o, i) =>
      assert(o.length == i.length)
      assert(o.count(_.isDigit) == 1, s"expected exactly one digit in `$o`")
      assert(o.forall(c => c.isDigit || c.isLower))
    }
  }

  test("delete: exact warning prefix; empty rows untouched " +
    "(test_with_delete_warn_p :268-282)") {
    val in = randomStrings(n = 50, seed = 15) ++ Seq.fill(50)("")
    val m = WithDelete(seed = 919)
    expectWarning("with_delete: desired probability of 0.8 cannot be met") {
      val got = collectV(m(frame(in), Seq("v"), 0.8, col(Gecko.RowId)))
      got.zip(in).take(50).foreach { case (o, i) =>
        assert(o.length == i.length - 1)
      }
      assert(got.drop(50).forall(_ == ""))
    }
  }

  test("transpose: exact warning prefix; single-char rows untouched " +
    "(test_with_transpose_warn_p :347-361)") {
    val in = randomStrings(n = 50, seed = 16, unique = true) ++
      Seq.fill(50)("a")
    val m = WithTranspose(seed = 920)
    expectWarning(
      "with_transpose: desired probability of 0.8 cannot be met") {
      val got = collectV(m(frame(in), Seq("v"), 0.8, col(Gecko.RowId)))
      got.zip(in).take(50).foreach { case (o, i) =>
        assert(o != i && o.length == i.length)
        assert(o.sorted == i.sorted)
      }
      assert(got.drop(50).forall(_ == "a"))
    }
  }

  test("substitute: exact warning prefix; empty rows untouched " +
    "(test_with_substitute_warn_p :407-421)") {
    val in = randomStrings(n = 50, charset = "0123456789", seed = 17) ++
      Seq.fill(50)("")
    val m = WithSubstitute(seed = 921)
    expectWarning(
      "with_substitute: desired probability of 0.8 cannot be met") {
      val got = collectV(m(frame(in), Seq("v"), 0.8, col(Gecko.RowId)))
      got.zip(in).take(50).foreach { case (o, i) =>
        assert(o != i && o.length == i.length)
      }
      assert(got.drop(50).forall(_ == ""))
    }
  }

  test("uppercase/lowercase: exact warning prefixes at unattainable p " +
    "(test_with_uppercase_warn_p :445-462, test_with_lowercase_warn_p " +
    ":486-503)") {
    val mixed = Seq.fill(50)("abc") ++ Seq.fill(50)("ABC")
    expectWarning(
      "with_uppercase: desired probability of 0.8 cannot be met") {
      val got = collectV(WithUppercase(seed = 922)(frame(mixed), Seq("v"),
        0.8, col(Gecko.RowId)))
      assert(got.take(50).forall(_ == "ABC")) // all eligible mutated
      assert(got.drop(50).forall(_ == "ABC"))
    }
    expectWarning(
      "with_lowercase: desired probability of 0.8 cannot be met") {
      val got = collectV(WithLowercase(seed = 923)(frame(mixed), Seq("v"),
        0.8, col(Gecko.RowId)))
      assert(got.forall(_ == "abc"))
    }
  }

  test("missingValue: exact warning prefix when sentinel pre-exists " +
    "(test_with_missing_value_existing :82-93)") {
    val in = Seq.fill(20)("foo") ++ Seq.fill(80)("")
    expectWarning(
      "with_missing_value: desired probability of 0.5 cannot be met") {
      val got = collectV(WithMissingValue("", seed = 924)(frame(in),
        Seq("v"), 0.5, col(Gecko.RowId)))
      assert(got.forall(_ == ""))
    }
  }

  test("keymap: exact warning prefix with digit charset restriction " +
    "(test_with_cldr_keymap_file_warn_low_p :41-59)") {
    val m = WithCldrKeymap(graft.mut.Cldr.neighborCandidates(
      getClass.getResourceAsStream("/assets/de-t-k0-windows.xml"),
      Some("0123456789")), seed = 925)
    val in = Seq.fill(20)("123") ++ Seq.fill(80)("foobar")
    expectWarning(
      "with_cldr_keymap_file: desired probability of 0.5 cannot be met") {
      val got = collectV(m(frame(in), Seq("v"), 0.5, col(Gecko.RowId)))
      got.zip(in).take(20).foreach { case (o, i) =>
        assert(o != i && o.length == 3)
      }
      assert(got.drop(20).forall(_ == "foobar"))
    }
  }

  // -------------------------------------------------------- _cldr
  test("cldr: full neighbor boundary matrix " +
    "(test_get_neighbor_kb_pos_for tests/test_cldr.py:28-60)") {
    val cases = Seq(
      // (pos, maxRow, maxCol) -> expected neighbor set
      ((1, 1, 0), 5, 14) -> Set((1, 1, 1), (0, 1, 0), (2, 1, 0),
        (1, 0, 0), (1, 2, 0)), // trbl, no shift
      ((1, 1, 1), 5, 14) -> Set((1, 1, 0), (0, 1, 1), (2, 1, 1),
        (1, 0, 1), (1, 2, 1)), // trbl, shift
      ((1, 0, 0), 5, 14) -> Set((1, 0, 1), (0, 0, 0), (2, 0, 0),
        (1, 1, 0)), // no left neighbor
      ((0, 1, 0), 5, 14) -> Set((0, 1, 1), (0, 0, 0), (0, 2, 0),
        (1, 1, 0)), // no top neighbor
      ((1, 14, 0), 5, 14) -> Set((1, 14, 1), (0, 14, 0), (2, 14, 0),
        (1, 13, 0)), // no right neighbor
      ((5, 13, 0), 5, 14) -> Set((5, 13, 1), (5, 14, 0), (5, 12, 0),
        (4, 13, 0))) // no bottom neighbor
    cases.foreach { case (((pos), maxRow, maxCol), expected) =>
      val got = graft.mut.Cldr.neighborsOf(pos, maxRow, maxCol).toSet
      assert(got == expected, s"pos $pos: got $got, want $expected")
    }
  }

  // ------------------------------------------------------------- M20
  test("mutateDataFrame: end-to-end chained/weighted/permute matrix " +
    "(test_mutate_data_frame :1289-1350)") {
    import graft.mut.MutateDataFrame
    val n = 20000
    def strs(seed: Int) = randomStrings(n = n, len = 26,
      charset = "abcdefghijklmnopqrstuvwxyz", seed = seed, unique = true)
    val (c1, c2, c3, c4) = (strs(21), strs(22), strs(23), strs(24))
    val df = c1.indices.map(i =>
      (i.toLong, c1(i), c2(i), c3(i), c4(i)))
      .toDF(Gecko.RowId, "col_1", "col_2", "col_3", "col_4")

    val out = MutateDataFrame(df, Seq(
      // col_1: both mutators applied to ALL rows, sequentially
      (Seq("col_1"), Seq(
        (1.0, WithDelete(seed = 951): graft.mut.Mutator),
        (1.0, WithUppercase(seed = 952): graft.mut.Mutator))),
      // col_2: ~50% get an uppercase char inserted
      (Seq("col_2"), Seq(
        (0.5, WithInsert(charset = ('A' to 'Z').mkString, seed = 953)
          : graft.mut.Mutator))),
      // col_3/col_4: permuted jointly
      (Seq("col_3", "col_4"), Seq(
        (1.0, WithPermute(seed = 954): graft.mut.Mutator))))
    ).orderBy(Gecko.RowId).collect()

    out.zipWithIndex.foreach { case (r, i) =>
      val (o1, o2, o3, o4) =
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      // col_1: delete took one char, uppercase folded the rest
      assert(o1 != c1(i) && o1.length == 25 && o1 == o1.toUpperCase, o1)
      // col_3/col_4: the only 2-column derangement is the swap
      assert(o3 == c4(i) && o4 == c3(i))
      assert(o2.length == 26 || o2.length == 27)
    }
    // col_2: mutated/untouched split balances around p=0.5
    val n27 = out.count(_.getString(2).length == 27)
    assert(math.abs(n27 - (n - n27)).toDouble / n < 0.02,
      s"insert split off: $n27 of $n")
  }

  // ----------------------------------------------- G4/G5 input matrix
  private def writeTempCsv(name: String, lines: Seq[String]): String = {
    val f = java.nio.file.Files.createTempDirectory("graft-matrix")
      .resolve(name)
    java.nio.file.Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("freqTable: no-header CSV with positional refs " +
    "(test_from_frequency_table_no_header tests/test_generator.py" +
    ":47-57)") {
    val path = writeTempCsv("freq_no_header.csv",
      Seq("foo,4", "bar,6"))
    val g = Generators.fromFrequencyTable(spark, path,
      Left(0), Left(1), ",", seed = 930)
    val vals = g.generate(spark, 100).select("c0").collect()
      .map(_.getString(0))
    assert(vals.contains("foo") && vals.contains("bar"))
    assert(vals.forall(v => v == "foo" || v == "bar"))
  }

  test("freqTable: header CSV with named refs " +
    "(test_from_frequency_table_with_header :59-70)") {
    val path = writeTempCsv("freq_header.csv",
      Seq("value,freq", "foo,4", "bar,6"))
    val g = Generators.fromFrequencyTable(spark, path,
      Right("value"), Right("freq"), ",", seed = 931)
    val vals = g.generate(spark, 100).select("c0").collect()
      .map(_.getString(0))
    assert(vals.contains("foo") && vals.contains("bar"))
    assert(vals.forall(v => v == "foo" || v == "bar"))
  }

  test("freqTable: TSV via delimiter option " +
    "(test_from_frequency_table_tsv :72-78)") {
    val path = writeTempCsv("freq_no_header.tsv",
      Seq("foo\t4", "bar\t6"))
    val g = Generators.fromFrequencyTable(spark, path,
      Left(0), Left(1), "\t", seed = 932)
    val vals = g.generate(spark, 100).select("c0").collect()
      .map(_.getString(0))
    assert(vals.contains("foo") && vals.contains("bar"))
    assert(vals.forall(v => v == "foo" || v == "bar"))
  }

  test("freqTable: fruit value domain is exactly the table's " +
    "(test_from_frequency_table :83-96)") {
    val path = writeTempCsv("freq_fruits.csv",
      Seq("fruit,count", "apple,50", "banana,30", "orange,20"))
    val g = Generators.fromFrequencyTable(spark, path,
      Right("fruit"), Right("count"), ",", seed = 933)
    val vals = g.generate(spark, 100).select("c0").collect()
      .map(_.getString(0))
    assert(vals.distinct.sorted.toSeq == Seq("apple", "banana", "orange"))
  }

  test("datetimeRange: all-units matrix — finer units activate the " +
    "time fields (test_from_datetime_range_all_units :149-164)") {
    Seq("d", "days", "h", "hours", "m", "minutes", "s", "seconds")
      .foreach { unit =>
        val g = Generators.FromDatetimeRange("1920-01-01", "2020-01-01",
          "%d.%m.%Y %H:%M:%S", unit, seed = 940)
        val vals = g.generate(spark, 100).select("c0").collect()
          .map(_.getString(0))
        assert(vals.forall(_.matches(
          """\d{2}\.\d{2}\.\d{4} \d{2}:\d{2}:\d{2}""")), unit)
        val hourAllZero = vals.forall(_.substring(11, 13) == "00")
        val minAllZero = vals.forall(_.substring(14, 16) == "00")
        val secAllZero = vals.forall(_.substring(17, 19) == "00")
        assert(!hourAllZero ==
          Seq("h", "hours", "m", "minutes", "s", "seconds").contains(unit),
          s"unit $unit hour zero-ness wrong")
        assert(!minAllZero == Seq("m", "minutes", "s", "seconds")
          .contains(unit), s"unit $unit minute zero-ness wrong")
        assert(!secAllZero == Seq("s", "seconds").contains(unit),
          s"unit $unit second zero-ness wrong")
      }
  }

  test("freqTable: empty-string values survive CSV loading, never " +
    "coerced to null (test_from_frequency_table_nan :218-231)") {
    val path = writeTempCsv("freq_nan.csv",
      Seq("value,freq", "\"\",1", "\"foobar\",1"))
    val g = Generators.fromFrequencyTable(spark, path,
      Right("value"), Right("freq"), ",", seed = 941)
    val vals = g.generate(spark, 100).select("c0").collect()
      .map(_.getString(0)) // getString throws on null
    assert(vals.forall(v => v == "" || v == "foobar"))
    assert(vals.contains(""))
  }

  test("multicolumnFreqTable: empty strings in joint CSV stay " +
    "non-null (test_from_multicolumn_frequency_table_nan :246-262)") {
    val path = writeTempCsv("freq_nan2.csv",
      Seq("value1,value2,freq", "\"\",\"bar\",1", "\"foo\",\"baz\",1"))
    val g = Generators.fromMulticolumnFrequencyTable(spark, path,
      Seq(Right("value1"), Right("value2")), Right("freq"), ",",
      seed = 942)
    val rows = g.generate(spark, 100).select("c0", "c1").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.forall { case (a, b) =>
      (a == "" && b == "bar") || (a == "foo" && b == "baz")
    })
  }

  test("fromGroup: 7 equal generators need rounding adjustment 2; " +
    "1 is not enough; counts land exactly (test_from_group_* " +
    ":388-454)") {
    val seven = Seq.fill(7)((1.0 / 7,
      Generators.FromFunction(_ => "a"): graft.gen.Generator))
    // adjustment 2 absorbs the +2 rounding drift at 100000 rows
    val g = Generators.FromGroup(seven, maxRoundingAdjustment = 2,
      seed = 943)
    assert(g.countsFor(100000L).sum == 100000L)
    // adjustment 1 cannot
    val tooLow = Generators.FromGroup(seven, maxRoundingAdjustment = 1,
      seed = 944)
    val e1 = intercept[IllegalArgumentException](tooLow.countsFor(100000L))
    assert(e1.getMessage.contains("cannot account for this difference"))
    // no adjustment: the reference's exact wording
    val none = Generators.FromGroup(
      Seq((1.0 / 3, Generators.FromFunction(_ => "a"): graft.gen.Generator),
        (1.0 / 3, Generators.FromFunction(_ => "b")),
        (1.0 / 3, Generators.FromFunction(_ => "c"))), seed = 945)
    val e2 = intercept[IllegalArgumentException](none.countsFor(100000L))
    assert(e2.getMessage.startsWith("sum of values per generator does " +
      "not equal amount of desired rows: expected 100000, is "))
    assert(e2.getMessage.contains("`maxRoundingAdjustment`"))
  }

  test("fromGroup: weight-sum and arity error messages match the " +
    "reference (test_from_group_raise_* :367-386)") {
    val e1 = intercept[IllegalArgumentException] {
      Generators.FromGroup(Seq(
        (0.2, Generators.FromFunction(_ => "a"): graft.gen.Generator),
        (0.3, Generators.FromFunction(_ => "b"))), seed = 946)
    }
    assert(e1.getMessage == "requirement failed: " +
      "sum of weights must be 1, is 0.5")
    val joint = Generators.fromMulticolumnFrequencyTable(spark,
      Seq(("x", "u", 1), ("y", "v", 1)).toDF("a", "b", "f"),
      Seq("a", "b"), "f", seed = 947)
    val e2 = intercept[IllegalArgumentException] {
      Generators.FromGroup(Seq(
        (0.5, Generators.FromFunction(_ => "a"): graft.gen.Generator),
        (0.5, joint: graft.gen.Generator)), seed = 948)
    }
    assert(e2.getMessage.contains(
      "generators returned different amounts of columns: got 1, 2"))
  }

  test("multicolumnFreqTable: CSV joint rows stay consistent " +
    "(test_from_multicolumn_frequency_table :99-124)") {
    val path = writeTempCsv("freq_fruits_types.csv", Seq(
      "fruit,type,count",
      "apple,braeburn,10", "apple,elstar,20",
      "banana,cavendish,15", "banana,plantain,15",
      "orange,clementine,25", "orange,mandarin,15"))
    val g = Generators.fromMulticolumnFrequencyTable(spark, path,
      Seq(Right("fruit"), Right("type")), Right("count"), ",", seed = 934)
    val rows = g.generate(spark, 100).select("c0", "c1").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val allowed = Map(
      "apple" -> Set("braeburn", "elstar"),
      "banana" -> Set("cavendish", "plantain"),
      "orange" -> Set("clementine", "mandarin"))
    rows.foreach { case (fruit, tpe) =>
      assert(allowed.contains(fruit), s"unknown fruit `$fruit`")
      assert(allowed(fruit).contains(tpe),
        s"type `$tpe` impossible for fruit `$fruit`")
    }
  }

  // ------------------------------------------------------------- M16
  test("withGenerator: prepend/append join-char splice matrix + exact " +
    "arity error (test_mutator.py:653-736)") {
    val df = frame(randomStrings(n = 50, len = 6, charset = "0123456789"))
    val scalar = Generators.FromFunction(_ => "foobar")
    def run(mode: String, join: String): Array[String] =
      collectV(Mutators.WithGenerator(scalar, mode, join, seed = 81)(
        df, Seq("v"), 1.0, col(Gecko.RowId)))
    // default join " " (test :653, :663)
    assert(run("prepend", " ").forall(_.matches("""foobar \d{6}""")))
    assert(run("append", " ").forall(_.matches("""\d{6} foobar""")))
    // custom join char "-" (test :673, :683)
    assert(run("prepend", "-").forall(_.matches("""foobar-\d{6}""")))
    assert(run("append", "-").forall(_.matches("""\d{6}-foobar""")))
    // {} insert marker places the generated value INSIDE the join
    // string (test :693, :703)
    assert(run("prepend", " ({}) ").forall(_.matches(""" \(foobar\) \d{6}""")))
    assert(run("append", " ({}) ").forall(_.matches("""\d{6} \(foobar\) """)))
    // arity mismatch: full reference message, not just a fragment
    val joint = Seq(("a", "b", 1)).toDF("x", "y", "n")
    val gen2 = Generators.fromMulticolumnFrequencyTable(spark, joint,
      Seq("x", "y"), "n", seed = 82)
    val e = intercept[IllegalArgumentException] {
      Mutators.WithGenerator(gen2, "replace", seed = 83)(
        df, Seq("v"), 1.0, col(Gecko.RowId))
    }
    assert(e.getMessage ==
      "generator must generate as many series as provided to the " +
        "mutator: got 2, expected 1")
  }

  // ------------------------------------------------------------- M19
  test("withGroup: insert+delete length split {19,21}, all rows changed " +
    "at p=1, mixed at p=0.5 (test_mutator.py:738-771)") {
    val vals = randomStrings(n = 400, len = 20,
      charset = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
      seed = 84)
    val df = frame(vals)
    val grp = Mutators.WithGroup(Seq(
      (0.5, Mutators.WithInsert(charset = "0123456789", seed = 85)),
      (0.5, Mutators.WithDelete(seed = 86))), seed = 87)
    val full = collectV(grp(df, Seq("v"), 1.0, col(Gecko.RowId)))
    assert(full.zip(vals).forall { case (b, a) => b != a })
    assert(full.map(_.length).toSet == Set(19, 21))
    val half = collectV(grp(df, Seq("v"), 0.5, col(Gecko.RowId)))
    assert(half.zip(vals).exists { case (b, a) => b == a })
    assert(half.zip(vals).exists { case (b, a) => b != a })
  }

  test("withGroup: 0.2/0.8 weights favor delete; weight sum < 1 pads " +
    "with untouched rows (test_mutator.py:773-806)") {
    val vals = randomStrings(n = 2000, len = 20,
      charset = "abcdefghijklmnopqrstuvwxyz", seed = 88)
    val df = frame(vals)
    val weighted = collectV(Mutators.WithGroup(Seq(
      (0.2, Mutators.WithInsert(charset = "0123456789", seed = 89)),
      (0.8, Mutators.WithDelete(seed = 90))), seed = 91)(
      df, Seq("v"), 1.0, col(Gecko.RowId)))
    val wLens = weighted.map(_.length)
    assert(wLens.count(_ == 19) > wLens.count(_ == 21))
    // weights sum to 0.2: the other 0.8 is an implicit noop pad
    val padded = collectV(Mutators.WithGroup(Seq(
      (0.2, Mutators.WithInsert(charset = "0123456789", seed = 92))),
      seed = 93)(df, Seq("v"), 1.0, col(Gecko.RowId)))
    val pLens = padded.map(_.length)
    assert(pLens.count(_ == 20) > pLens.count(_ == 21))
    assert(pLens.count(_ == 21) > 0)
  }

  test("withGroup: weight-sum error messages (test_mutator.py:808-832)") {
    val eHigh = intercept[IllegalArgumentException] {
      Mutators.WithGroup(Seq(
        (0.6, Mutators.WithDelete(seed = 94)),
        (0.41, Mutators.WithInsert(seed = 95))), seed = 96)
    }
    // the reference interpolates the float sum verbatim; same here
    assert(eHigh.getMessage.contains(
      s"sum of weights must not be higher than 1, is ${0.6 + 0.41}"))
    val eLow = intercept[IllegalArgumentException] {
      Mutators.WithGroup(Seq(
        (0.0, Mutators.WithDelete(seed = 97)),
        (0.0, Mutators.WithInsert(seed = 98))), seed = 99)
    }
    // reference renders the int sum as "0"; Scala's Double shows 0.0 —
    // assert the prefix, which is the behavioral contract
    assert(eLow.getMessage.contains("sum of weights must be higher than 0"))
  }

  // ------------------------------------------------------------- M15
  test("withDatetimeOffset: zero delta rejected with exact message " +
    "(test_mutator.py:962-966)") {
    val e = intercept[IllegalArgumentException] {
      Mutators.WithDatetimeOffset(0, "d", "%Y-%m-%d", seed = 100)
    }
    assert(e.getMessage.contains("delta must be positive, is 0"))
  }

  // -------------------------------------------------------------- G6
  test("fromDatetimeRange: parse-error prefix + end-before-start " +
    "message (test_generator.py:134-171)") {
    val eStart = intercept[IllegalArgumentException] {
      Generators.FromDatetimeRange("foobar", "2020-01-01", "%d.%m.%Y",
        "days", seed = 101)
    }
    assert(eStart.getMessage.startsWith("Error parsing datetime string"))
    val eEnd = intercept[IllegalArgumentException] {
      Generators.FromDatetimeRange("1920-01-01", "foobar", "%d.%m.%Y",
        "days", seed = 102)
    }
    assert(eEnd.getMessage.startsWith("Error parsing datetime string"))
    val eInv = intercept[IllegalArgumentException] {
      Generators.FromDatetimeRange("2020-01-01", "1920-01-01", "%d.%m.%Y",
        "days", seed = 103)
    }
    assert(eInv.getMessage.contains(
      "start datetime `2020-01-01` is greater than end datetime `1920-01-01`"))
  }

  // -------------------------------------------------------------- G8
  test("toDataFrame: empty list and non-positive count messages " +
    "(test_generator.py:174-188)") {
    import graft.gen.ToDataFrame
    val eEmpty = intercept[IllegalArgumentException] {
      ToDataFrame(spark, Seq.empty, 1000L)
    }
    assert(eEmpty.getMessage.contains("generator list may not be empty"))
    val eCount = intercept[IllegalArgumentException] {
      ToDataFrame(spark,
        Seq((Seq("foo"), Generators.FromUniformDistribution(0, 1, 6,
          seed = 104): graft.gen.Generator)), 0L)
    }
    assert(eCount.getMessage.contains("amount of rows must be positive, is 0"))
  }
}
