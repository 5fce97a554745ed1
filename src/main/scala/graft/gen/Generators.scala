package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{DateTimeUnit, Gecko, Rand, Strftime}

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** Layer A generators (SURVEY.md §2.1), one per reference operator.
  * All are expression-backed except [[FromGroup]]. Every instance takes
  * an explicit `seed`; per-row uniforms are stable functions of
  * (rowId, seed, drawIndex) so output is byte-identical across runs,
  * partition counts, and cluster sizes. */
object Generators {

  // ------------------------------------------------------------------ G1
  /** Arbitrary per-row function escape hatch (reference:
    * gecko/generator.py:29-49). The function receives the row id so it
    * can be deterministic — the reference's version relies on closures
    * over an RNG instead. Documented-slow: a Scala UDF breaks codegen. */
  case class FromFunction(fn: Long => String) extends Generator {
    private val f = udf(fn)
    override def exprs(rid: Column): Seq[Column] = Seq(f(rid))
  }

  // ------------------------------------------------------------------ G2
  /** U[low, high) floats formatted to `precision` decimals (reference:
    * gecko/generator.py:52-78). */
  case class FromUniformDistribution(low: Double = 0.0, high: Double = 1.0,
                                     precision: Int = 6, seed: Long)
      extends Generator {
    require(low < high, s"low ($low) must be less than high ($high)")
    override def exprs(rid: Column): Seq[Column] = Seq(
      format_string(s"%.${precision}f",
        lit(low) + Rand.uniform(rid, seed) * lit(high - low)))
  }

  // ------------------------------------------------------------------ G3
  /** N(mean, sd) floats formatted to `precision` decimals (reference:
    * gecko/generator.py:81-107). */
  case class FromNormalDistribution(mean: Double = 0.0, sd: Double = 1.0,
                                    precision: Int = 6, seed: Long)
      extends Generator {
    require(sd >= 0, s"standard deviation must not be negative, is $sd")
    override def exprs(rid: Column): Seq[Column] = Seq(
      format_string(s"%.${precision}f",
        lit(mean) + Rand.gaussian(rid, seed) * lit(sd)))
  }

  // ---------------------------------------------------------- G4 / G5
  /** Weighted categorical sampling from a (value..., freq) table
    * (reference: gecko/generator.py:110-170 single-column,
    * generator.py:173-254 multicolumn). The whole table is loaded at
    * plan time (as the reference does CSV I/O at factory-call time,
    * generator.py:147-165), reduced to a cumulative-probability array,
    * and broadcast; sampling is one binary search per row — O(log k) —
    * inside a deterministic UDF. Multicolumn sampling draws one row
    * index and projects all k values from it, which preserves intra-row
    * consistency (generator.py:250-252). */
  class FromFrequencyTable private[gen] (
      spark: SparkSession,
      rows: Array[Array[String]],     // one entry per table row (k values)
      freqs: Array[Long],
      override val arity: Int,
      seed: Long) extends Generator {

    require(rows.nonEmpty, "frequency table must not be empty")
    require(freqs.forall(_ >= 0), "frequencies must not be negative")
    private val total = freqs.sum.toDouble
    require(total > 0, "sum of frequencies must be positive")

    // cumulative probabilities; last entry forced to 1.0
    private val cum: Array[Double] = {
      val c = new Array[Double](freqs.length)
      var acc = 0.0
      var i = 0
      while (i < freqs.length) { acc += freqs(i) / total; c(i) = acc; i += 1 }
      c(freqs.length - 1) = 1.0
      c
    }

    private val bRows = spark.sparkContext.broadcast(rows)
    private val bCum = spark.sparkContext.broadcast(cum)

    private val sample = {
      // bind broadcasts to locals so the UDF closure does not capture
      // `this` (which is not serializable)
      val rowsB = bRows
      val cumB = bCum
      udf { (u: Double) =>
        val c = cumB.value
        // first index with u < c(idx)
        var lo = 0
        var hi = c.length - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (u < c(mid)) hi = mid else lo = mid + 1
        }
        rowsB.value(lo).toSeq
      }
    }

    override def exprs(rid: Column): Seq[Column] = {
      val arr = sample(Rand.uniform(rid, seed))
      (0 until arity).map(i => element_at(arr, i + 1))
    }
  }

  /** Single-column frequency table from a DataFrame (G4). */
  def fromFrequencyTable(spark: SparkSession, df: DataFrame,
                         valueColumn: String, freqColumn: String,
                         seed: Long): FromFrequencyTable =
    fromMulticolumnFrequencyTable(spark, df, Seq(valueColumn), freqColumn, seed)

  /** Single-column frequency table from a CSV file (G4). Header
    * presence is inferred from whether the column refs are names or
    * positions, as in the reference (generator.py:150); `encoding`
    * mirrors generator.py:116. */
  def fromFrequencyTable(spark: SparkSession, path: String,
                         valueColumn: Either[Int, String],
                         freqColumn: Either[Int, String],
                         delimiter: String,
                         seed: Long,
                         encoding: String = "UTF-8"): FromFrequencyTable = {
    val (df, vCol, fCol) =
      readCsv(spark, path, Seq(valueColumn), freqColumn, delimiter, encoding)
    fromMulticolumnFrequencyTable(spark, df, vCol, fCol, seed)
  }

  /** Multicolumn joint frequency table (G5). */
  def fromMulticolumnFrequencyTable(spark: SparkSession, df: DataFrame,
                                    valueColumns: Seq[String],
                                    freqColumn: String,
                                    seed: Long): FromFrequencyTable = {
    val freqField = df.schema(freqColumn)
    require(Seq("integer", "long", "short", "byte")
      .contains(freqField.dataType.typeName),
      s"frequency column `$freqColumn` must be of an integer type, " +
        s"is ${freqField.dataType.typeName}")
    // deterministic table order: an unordered collect() can reorder
    // rows across partition layouts, which would silently remap the
    // cumulative-probability array between runs and break the
    // byte-identical reproducibility contract
    val collected = df
      .select((valueColumns.map(c => col(c).cast("string")) :+
        col(freqColumn).cast("long")): _*)
      .orderBy(valueColumns.map(col): _*)
      .collect()
    val rows = collected.map(r =>
      Array.tabulate(valueColumns.size)(i => r.getString(i)))
    val freqs = collected.map(_.getLong(valueColumns.size))
    new FromFrequencyTable(spark, rows, freqs, valueColumns.size, seed)
  }

  /** Multicolumn joint frequency table from CSV (G5; `encoding`
    * mirrors generator.py:186). */
  def fromMulticolumnFrequencyTable(spark: SparkSession, path: String,
                                    valueColumns: Seq[Either[Int, String]],
                                    freqColumn: Either[Int, String],
                                    delimiter: String,
                                    seed: Long,
                                    encoding: String = "UTF-8")
      : FromFrequencyTable = {
    val (df, vCols, fCol) =
      readCsv(spark, path, valueColumns, freqColumn, delimiter, encoding)
    fromMulticolumnFrequencyTable(spark, df, vCols, fCol, seed)
  }

  /** CSV loader shared by G4/G5: header inferred from column-ref style;
    * no NA coercion (the reference reads with keep_default_na=False —
    * generator.py:157-158). */
  private def readCsv(spark: SparkSession, path: String,
                      valueColumns: Seq[Either[Int, String]],
                      freqColumn: Either[Int, String], delimiter: String,
                      encoding: String = "UTF-8")
      : (DataFrame, Seq[String], String) = {
    val refs = valueColumns :+ freqColumn
    val allNamed = refs.forall(_.isRight)
    val allIndexed = refs.forall(_.isLeft)
    require(allNamed || allIndexed,
      "value and frequency columns must either all be names or all be indices")
    // all columns read AS STRINGS: the reference pins value columns to
    // dtype=str (generator.py:153-157), so zip-code-like values keep
    // leading zeros and are never numerically reformatted. nullValue is
    // set to a NUL escape no real cell contains, disabling null
    // coercion (the reference reads with keep_default_na=False).
    val df = graft.core.CsvIo.read(spark, path, header = allNamed,
      delimiter, encoding)
    def resolve(ref: Either[Int, String]): String = ref match {
      case Right(name) => name
      case Left(idx) => df.columns(idx)
    }
    // freq column arrives as string from CSV: coerce to long, loudly
    val fCol = resolve(freqColumn)
    val coerced = df.withColumn(fCol, col(fCol).cast("long"))
    val bad = coerced.filter(col(fCol).isNull).count()
    if (bad > 0)
      throw new IllegalArgumentException(
        s"frequency column `$fCol` must be of an integer type " +
          s"($bad non-integer values in $path)")
    (coerced, valueColumns.map(resolve), fCol)
  }

  // ------------------------------------------------------------------ G6
  /** Uniform datetimes in [start, end] at `unit` granularity, formatted
    * with a strftime pattern (reference: gecko/generator.py:257-307).
    * The draw is inclusive of the endpoint, as in the reference
    * (rng.integers(..., endpoint=True), generator.py:301). */
  case class FromDatetimeRange(startDt: String, endDt: String,
                               dtFormat: String, unit: String, seed: Long)
      extends Generator {
    private val u = DateTimeUnit.parse(unit)
    private val startEpoch = parseIso(startDt)
    private val endEpoch = parseIso(endDt)
    require(startEpoch < endEpoch,
      s"start datetime `$startDt` is greater than end datetime `$endDt`")
    private val deltaUnits = (endEpoch - startEpoch) / u.seconds
    private val jdkFmt = Strftime.toJava(dtFormat)

    override def exprs(rid: Column): Seq[Column] = {
      val draw = floor(Rand.uniform(rid, seed) * lit(deltaUnits + 1.0))
        .cast("long")
      Seq(date_format(
        timestamp_seconds(lit(startEpoch) + draw * lit(u.seconds)), jdkFmt))
    }
  }

  /** Unparseable datetimes surface with numpy's message prefix so the
    * reference's error contract holds verbatim
    * (tests/test_generator.py:134-146 asserts the
    * "Error parsing datetime string" prefix np.datetime64 raises). */
  private def parseIso(s: String): Long =
    try LocalDateTime.parse(s).toEpochSecond(ZoneOffset.UTC)
    catch {
      case _: java.time.format.DateTimeParseException =>
        try LocalDate.parse(s).atStartOfDay.toEpochSecond(ZoneOffset.UTC)
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"""Error parsing datetime string "$s" at position 0""")
        }
    }

  // ------------------------------------------------------------------ G7
  /** Mixture of generators with weights (reference:
    * gecko/generator.py:310-421). Per-generator counts are computed
    * exactly on the driver with the reference's rounding-adjustment
    * semantics (generator.py:363-388: banker's rounding, then random
    * ±1 fixes up to maxRoundingAdjustment); the outputs are unioned and
    * deterministically shuffled by sorting on a seeded hash — the
    * distributed analog of the reference's global reindex shuffle
    * (generator.py:406-419). Row ids remain the unique 0..n-1 range. */
  case class FromGroup(generators: Seq[(Double, Generator)],
                       maxRoundingAdjustment: Int = 0, seed: Long)
      extends Generator {
    require(maxRoundingAdjustment >= 0,
      s"rounding adjustment must not be negative, is $maxRoundingAdjustment")
    require(generators.nonEmpty, "generator list must not be empty")
    private val pSum = generators.map(_._1).sum
    require(math.abs(pSum - 1.0) < 1e-9, s"sum of weights must be 1, is $pSum")
    private val arities = generators.map(_._2.arity).distinct
    require(arities.size == 1,
      "generators returned different amounts of columns: got " +
        generators.map(_._2.arity).sorted.mkString(", "))

    override val arity: Int = arities.head
    override def isExprBacked: Boolean = false
    override def exprs(rid: Column): Seq[Column] =
      throw new UnsupportedOperationException(
        "FromGroup is not expression-backed; use generate()")

    /** Exact per-generator counts (driver-side, mirrors
      * generator.py:363-388). */
    private[graft] def countsFor(n: Long): Seq[Long] = {
      val counts = generators.map { case (p, _) =>
        BigDecimal(n * p)
          .setScale(0, BigDecimal.RoundingMode.HALF_EVEN).toLong
      }.toArray
      val diff = n - counts.sum
      if (diff != 0) {
        if (maxRoundingAdjustment == 0)
          throw new IllegalArgumentException(
            s"sum of values per generator does not equal amount of desired " +
              s"rows: expected $n, is ${counts.sum} - this is likely due to " +
              "rounding errors and can be compensated for by adjusting " +
              "`maxRoundingAdjustment`")
        if (math.abs(diff) > maxRoundingAdjustment)
          throw new IllegalArgumentException(
            s"sum of values per generator does not equal amount of desired " +
              s"rows: expected $n, is ${counts.sum} - this is likely due to " +
              "rounding errors, but `maxRoundingAdjustment` is set so it " +
              "cannot account for this difference")
        val rnd = new scala.util.Random(seed)
        val sign = math.signum(diff)
        (0 until math.abs(diff).toInt).foreach { _ =>
          counts(rnd.nextInt(counts.length)) += sign
        }
      }
      counts.toSeq
    }

    override def generate(spark: SparkSession, n: Long): DataFrame = {
      require(n > 0, s"amount of rows must be positive, is $n")
      val counts = countsFor(n)
      val offsets = counts.scanLeft(0L)(_ + _)
      val parts = generators.zipWithIndex.map { case ((_, gen), i) =>
        val (start, count) = (offsets(i), counts(i))
        if (count == 0) None
        else if (gen.isExprBacked) {
          // shifted range keeps row ids globally unique with no join
          val rid = col("id")
          Some(spark.range(start, start + count).select(
            (rid.as(Gecko.RowId) +: gen.exprs(rid).zipWithIndex.map {
              case (e, j) => e.as(s"c$j")
            }): _*))
        } else {
          Some(gen.generate(spark, count)
            .withColumn(Gecko.RowId, col(Gecko.RowId) + lit(start)))
        }
      }.flatten
      val unioned = parts.reduce(_.unionAll(_))
      // deterministic shuffle: seeded-hash sort with row-id tiebreak,
      // then REASSIGN row ids by shuffled position — the reference's
      // reindex (generator.py:415-419) mixes values across indices, so
      // id-ordered consumers must see a mixture, not contiguous
      // per-generator blocks.
      //
      // The renumbering stays entirely inside the DataFrame API (the r1
      // version dropped to rdd.zipWithIndex, which re-ran the sort on
      // every downstream action and broke codegen): materialize the
      // shuffled layout ONCE (localCheckpoint — the sort output had to
      // be produced anyway), read the partition-encoded monotonic ids,
      // and rebase each partition by its global offset from one tiny
      // per-partition stats agg. Downstream plans read the materialized
      // partitions with whole-stage codegen and AQE intact.
      val sorted = unioned.orderBy(
        xxhash64(col(Gecko.RowId), lit(seed), lit(-1)), col(Gecko.RowId))
      val withMid = sorted
        .withColumn("__mid", monotonically_increasing_id())
        .localCheckpoint()
      val stats = withMid
        .groupBy(shiftright(col("__mid"), 33).as("__pid"))
        .agg(count(lit(1)).as("cnt"), min(col("__mid")).as("mn"))
        .orderBy("__pid")
        .collect() // one row per partition — tiny
      val maxPid = stats.map(_.getLong(0)).max.toInt
      val offArr = new Array[Long](maxPid + 1)
      val mnArr = new Array[Long](maxPid + 1)
      var acc = 0L
      stats.foreach { r =>
        val pid = r.getLong(0).toInt
        offArr(pid) = acc
        mnArr(pid) = r.getLong(2)
        acc += r.getLong(1)
      }
      val pid = shiftright(col("__mid"), 33).cast("int")
      val newId = element_at(typedlit(offArr.toSeq), pid + 1) +
        (col("__mid") - element_at(typedlit(mnArr.toSeq), pid + 1))
      withMid.withColumn(Gecko.RowId, newId).drop("__mid")
    }
  }
}
