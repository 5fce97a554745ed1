package graft.mut

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{DateTimeUnit, Gecko, ObservedWarnings, Rand, Strftime,
  Warnings}
import graft.gen.Generator

/** Layer A mutators (SURVEY.md §2.2) — the expression-backed set. Each
  * mutation is a single codegen'd string-splice/when() expression; no
  * UDFs, no shuffles. Rule-table mutators (M2/M3/M4/M17) live in
  * RuleMutators.scala. */
object Mutators {

  private val Ascii: String =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"

  /** 0-based random index in [0, n): shared splice-index helper. */
  private def idx(u: Column, n: Column): Column =
    floor(u * n.cast("double")).cast("int")

  /** Random char from a charset literal (1 draw). */
  private def charFrom(charset: String, u: Column): Column =
    lit(charset).substr(idx(u, lit(charset.length)) + 1, lit(1))

  // ------------------------------------------------------------------ M1
  /** Arbitrary scalar mutation fn on a p-fraction of rows (reference:
    * gecko/mutator.py:76-117). Escape hatch — breaks codegen. */
  case class WithFunction(fn: String => String, seed: Long)
      extends ExprMutator {
    private val f = udf(fn)
    override def mutated(c: Column, rid: Column, colIdx: Int): Column = f(c)
  }

  // ------------------------------------------------------------------ M5
  /** Overwrite with a sentinel "missing" string; rows already equal to
    * the sentinel are ineligible (reference: gecko/mutator.py:658-702,
    * eligibility :678). */
  case class WithMissingValue(value: String = "", seed: Long)
      extends ExprMutator {
    override def eligible(c: Column): Option[Column] = Some(c =!= lit(value))
    override def mutated(c: Column, rid: Column, colIdx: Int): Column =
      lit(value)
  }

  // ------------------------------------------------------------------ M6
  /** Insert one random charset char at a random position; always
    * eligible (reference: gecko/mutator.py:705-759). */
  case class WithInsert(charset: String = Ascii, seed: Long)
      extends ExprMutator {
    override def mutated(c: Column, rid: Column, colIdx: Int): Column = {
      val i = idx(draw(rid, colIdx, 1), length(c) + 1)
      concat(c.substr(lit(1), i),
        charFrom(charset, draw(rid, colIdx, 2)),
        c.substr(i + 1, length(c) - i))
    }
  }

  // ------------------------------------------------------------------ M7
  /** Delete the char at a random index; eligible iff len >= 1
    * (reference: gecko/mutator.py:762-812, eligibility :779). */
  case class WithDelete(seed: Long) extends ExprMutator {
    override def eligible(c: Column): Option[Column] = Some(length(c) >= 1)
    override def mutated(c: Column, rid: Column, colIdx: Int): Column = {
      val i = idx(draw(rid, colIdx, 1), length(c))
      concat(c.substr(lit(1), i), c.substr(i + 2, length(c) - i - 1))
    }
  }

  // ------------------------------------------------------------------ M8
  /** Swap adjacent chars at a random index; eligible iff len >= 2;
    * self-swap of equal chars is possible, as in the reference
    * (gecko/mutator.py:815-871, :819-821, eligibility :835). */
  case class WithTranspose(seed: Long) extends ExprMutator {
    override def eligible(c: Column): Option[Column] = Some(length(c) >= 2)
    override def mutated(c: Column, rid: Column, colIdx: Int): Column = {
      val i = idx(draw(rid, colIdx, 1), length(c) - 1)
      concat(c.substr(lit(1), i),
        c.substr(i + 2, lit(1)),
        c.substr(i + 1, lit(1)),
        c.substr(i + 3, length(c) - i - 2))
    }
  }

  // ------------------------------------------------------------------ M9
  /** Replace the char at a random index with a random charset char;
    * eligible iff len >= 1 (reference: gecko/mutator.py:874-938,
    * eligibility :902). */
  case class WithSubstitute(charset: String = Ascii, seed: Long)
      extends ExprMutator {
    override def eligible(c: Column): Option[Column] = Some(length(c) >= 1)
    override def mutated(c: Column, rid: Column, colIdx: Int): Column = {
      val i = idx(draw(rid, colIdx, 1), length(c))
      concat(c.substr(lit(1), i),
        charFrom(charset, draw(rid, colIdx, 2)),
        c.substr(i + 2, length(c) - i - 1))
    }
  }

  // ----------------------------------------------------------------- M10
  /** Identity; pads with_group weights (reference:
    * gecko/mutator.py:941-955). */
  case class WithNoop() extends Mutator {
    override def seed: Long = 0L
    override def applyToColumn(df: DataFrame, colName: String, colIdx: Int,
                               sel: Column, rid: Column): DataFrame = df
  }

  // ----------------------------------------------------------------- M11
  /** Replace a value with a *different* value drawn from the unique
    * set of a lookup column (reference: gecko/mutator.py:958-1056).
    * Uniques are collected driver-side (sorted, as the reference's
    * np.unique does — :1005) and inlined as a literal array; the
    * "different value" guarantee uses the skip-index trick over k-1
    * candidates (:1044-1048). Eligibility: value ∈ set (:1016-1018). */
  case class WithCategoricalValues(values: Seq[String], seed: Long)
      extends ExprMutator {
    private val uniques = values.distinct.sorted
    require(uniques.size >= 2,
      "column must contain at least two unique values, " +
        s"has ${uniques.size}")
    private val arr = typedlit(uniques)

    override def eligible(c: Column): Option[Column] =
      Some(array_contains(arr, c))

    override def mutated(c: Column, rid: Column, colIdx: Int): Column = {
      val pos0 = array_position(arr, c).cast("int") - 1 // 0-based own index
      val j = idx(draw(rid, colIdx, 1), lit(uniques.size - 1))
      element_at(arr, when(j >= pos0, j + 2).otherwise(j + 1))
    }
  }

  object WithCategoricalValues {
    /** Build from a DataFrame column (CSV/parquet/any source). */
    def apply(df: DataFrame, column: String,
              seed: Long): WithCategoricalValues = {
      val vals = df.select(col(column).cast("string"))
        .distinct().collect().map(_.getString(0)).toSeq
      WithCategoricalValues(vals, seed)
    }

    /** CSV path + name-or-position column ref, reference parity with
      * mutator.py:958-1006 (header inferred from ref style). */
    def fromCsv(spark: SparkSession, path: String,
                valueColumn: Either[Int, String] = Left(0),
                encoding: String = "UTF-8", delimiter: String = ",",
                seed: Long): WithCategoricalValues = {
      val (df, cols) = graft.mut.RuleMutators.readRuleCsv(
        spark, path, Seq(valueColumn), encoding, delimiter)
      apply(df, cols(0), seed)
    }
  }

  // ----------------------------------------------------------------- M12
  /** Swap values *between columns* per row such that no value stays in
    * its origin column — a random derangement of column indices per
    * row (reference: gecko/mutator.py:1059-1122). Derangements are
    * enumerated on the driver (k is tiny); the rewrite is a pure
    * when-chain over the original columns, no shuffle. */
  case class WithPermute(seed: Long) extends Mutator {

    /** Derangement enumeration is factorial in column count (!k of
      * k! permutations survive the filter; the rewrite is a !k-deep
      * when-chain per column). Fine at gecko-typical 2–4 columns;
      * reference behavior past that is the same silent explosion
      * (mutator.py:1059-1122 enumerates permutations too) — this
      * engine fails loudly instead of hanging the driver/codegen. !7
      * = 1854 branches is the last size whose when-chain still plans
      * in interactive time. */
    private[mut] val MaxPermuteColumns = 7

    private def derangements(k: Int): Seq[Seq[Int]] =
      (0 until k).permutations
        .filter(p => p.zipWithIndex.forall { case (v, i) => v != i })
        .map(_.toSeq).toSeq.sorted(Ordering.Implicits.seqOrdering[Seq, Int])

    override def applyToColumn(df: DataFrame, colName: String, colIdx: Int,
                               sel: Column, rid: Column): DataFrame =
      throw new UnsupportedOperationException(
        "WithPermute operates on all columns jointly")

    override def applyWithStats(df: DataFrame, cols: Seq[String], p: Double,
                                rid: Column,
                                stats: Seq[Seq[Any]]): DataFrame = {
      Gecko.checkProbability(p)
      if (cols.size < 2)
        throw new IllegalArgumentException(
          "list must contain at least two series to permute")
      require(cols.size <= MaxPermuteColumns,
        s"with_permute supports at most $MaxPermuteColumns columns " +
          s"(got ${cols.size}): derangement enumeration and the " +
          "per-row when-chain grow factorially — restructure into " +
          "smaller permute groups")
      val ds = derangements(cols.size)
      val sel = draw(rid, 0, 0) < lit(p)
      val dIdx = floor(draw(rid, 0, 1) * lit(ds.size.toDouble)).cast("int")
      val outCols = df.columns.map { name =>
        val i = cols.indexOf(name)
        if (i < 0) col(name)
        else {
          val permuted = ds.zipWithIndex.foldLeft(col(name)) {
            case (acc, (d, di)) =>
              when(dIdx === di, col(cols(d(i)))).otherwise(acc)
          }
          when(sel, permuted).otherwise(col(name)).as(name)
        }
      }
      df.select(outCols.toIndexedSeq: _*)
    }
  }

  // ----------------------------------------- M13 / M14
  /** Case-fold a p-fraction; eligibility = "folding changes the value"
    * (the reference uses ~islower()/~isupper() — mutator.py:1142,1186 —
    * which additionally counts caseless strings as eligible; this
    * engine's predicate only counts rows whose value actually changes,
    * which keeps the realized mutation rate at p). */
  case class WithLowercase(seed: Long) extends ExprMutator {
    override def eligible(c: Column): Option[Column] = Some(c =!= lower(c))
    override def mutated(c: Column, rid: Column, colIdx: Int): Column =
      lower(c)
    override def name: String = "with_lowercase"
  }

  case class WithUppercase(seed: Long) extends ExprMutator {
    override def eligible(c: Column): Option[Column] = Some(c =!= upper(c))
    override def mutated(c: Column, rid: Column, colIdx: Int): Column =
      upper(c)
    override def name: String = "with_uppercase"
  }

  // ----------------------------------------------------------------- M15
  /** Parse strings with dtFormat, offset by ±1..maxDelta units, guard
    * against wraparound of the next-coarser field if requested, and
    * reformat (reference: gecko/mutator.py:1213-1297; delta draw
    * :1253-1255 is integers in [1, maxDelta] times a random sign;
    * wraparound guard :1269-1282 reverts rows where the next-coarser
    * field changed). The reference's post-hoc "p unmet" warning when
    * wraparound reverts selected rows (mutator.py:1284-1289) is
    * replicated with `observe()` metrics — the revert count rides the
    * next action on the result, zero extra scan — delivered through
    * [[ObservedWarnings]]. */
  case class WithDatetimeOffset(maxDelta: Int, unit: String, dtFormat: String,
                                preventWraparound: Boolean = false, seed: Long)
      extends ExprMutator {
    require(maxDelta > 0, s"delta must be positive, is $maxDelta")
    private val u = DateTimeUnit.parse(unit)
    private val jdkFmt = Strftime.toJava(dtFormat)

    /** The requested p is threaded through to the observe() warning as
      * an explicit argument (no shared mutable state — plan
      * construction from multiple threads stays safe). */
    override def applyWithStats(df: DataFrame, cols: Seq[String], p: Double,
                                rid: Column, stats: Seq[Seq[Any]]): DataFrame = {
      Gecko.checkProbability(p)
      cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        val sel = selectionFor(c, i, p, rid, stats(i))
        applyToColumnP(d, c, i, sel, rid, p)
      }
    }

    private def newTsFor(c: Column, rid: Column, colIdx: Int)
        : (Column, Column) = {
      val ts = to_timestamp(c, jdkFmt)
      val mag = (idx(draw(rid, colIdx, 1), lit(maxDelta)) + 1).cast("long")
      val sign = when(draw(rid, colIdx, 2) < 0.5, -1L).otherwise(1L)
      (ts, timestamp_seconds(unix_timestamp(ts) + mag * sign * lit(u.seconds)))
    }

    private def coarser: Column => Column = u match {
      case DateTimeUnit.Days => month
      case DateTimeUnit.Hours => dayofmonth
      case DateTimeUnit.Minutes => hour
      case DateTimeUnit.Seconds => minute
    }

    override def mutated(c: Column, rid: Column, colIdx: Int): Column = {
      val (ts, newTs) = newTsFor(c, rid, colIdx)
      val guarded =
        if (!preventWraparound) newTs
        else when(coarser(newTs) =!= coarser(ts), ts).otherwise(newTs)
      date_format(guarded, jdkFmt)
    }

    /** Direct dispatch (WithGroup) reports p=1: the reference applies
      * group members to their row subset with p=1
      * (mutator.py:1706-1713). */
    override def applyToColumn(df: DataFrame, colName: String, colIdx: Int,
                               sel: Column, rid: Column): DataFrame =
      applyToColumnP(df, colName, colIdx, sel, rid, p = 1.0)

    private def applyToColumnP(df: DataFrame, colName: String, colIdx: Int,
                               sel: Column, rid: Column,
                               p: Double): DataFrame = {
      // observe BEFORE the rewrite so the revert predicate sees the
      // original values; the count piggybacks the next action — no
      // extra job, no UDF, stays inside codegen
      val input =
        if (!preventWraparound) df
        else {
          val (ts, newTs) = newTsFor(col(colName), rid, colIdx)
          val reverted = sel && coarser(newTs) =!= coarser(ts)
          ObservedWarnings.observeRevert(df, name, p, reverted, sel)
        }
      super.applyToColumn(input, colName, colIdx, sel, rid)
    }

    override def name: String = "with_datetime_offset"
  }

  // ----------------------------------------------------------------- M16
  /** Prepend/append/replace values with the output of another
    * generator; `{}` in joinWith marks where generated values land
    * (reference: gecko/mutator.py:1300-1389). The reference generates
    * count-of-selected values and ffill-reindexes them over the frame
    * (:1368-1370); this engine generates a value for every row from the
    * same row-id lineage and combines it only on selected rows — same
    * net semantics (SURVEY.md §2.2 M16), zero joins, zero shuffles.
    * Columns are mutated jointly: generator arity must match the
    * column count, and one selection draw covers the whole row. */
  case class WithGenerator(generator: Generator, mode: String,
                           joinWith: String = " ", seed: Long)
      extends Mutator {
    require(Seq("prepend", "append", "replace").contains(mode),
      s"invalid mode: `$mode`")
    require(generator.isExprBacked,
      "WithGenerator requires an expression-backed generator")

    private val (before, after) = {
      val parts = joinWith.split("\\{\\}", 2)
      if (parts.length == 1) {
        if (mode == "prepend") ("", parts(0))
        else if (mode == "append") (parts(0), "")
        else ("", "")
      } else (parts(0), parts(1))
    }

    override def applyToColumn(df: DataFrame, colName: String, colIdx: Int,
                               sel: Column, rid: Column): DataFrame = {
      val gen = generator.exprs(rid)(colIdx)
      val c = col(colName)
      val out = mode match {
        case "replace" => gen
        case "prepend" => concat(lit(before), gen, lit(after), c)
        case "append" => concat(c, lit(before), gen, lit(after))
      }
      df.withColumn(colName, when(sel, out).otherwise(c))
    }

    override def applyWithStats(df: DataFrame, cols: Seq[String], p: Double,
                                rid: Column,
                                stats: Seq[Seq[Any]]): DataFrame = {
      Gecko.checkProbability(p)
      if (generator.arity != cols.size)
        throw new IllegalArgumentException(
          "generator must generate as many series as provided to the " +
            s"mutator: got ${generator.arity}, expected ${cols.size}")
      val sel = draw(rid, 0, 0) < lit(p) // one draw for the whole row
      cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
        applyToColumn(d, c, i, sel, rid)
      }
    }
  }

  // ----------------------------------------------------------------- M18
  /** Duplicate the value, joined by joinWith (reference:
    * gecko/mutator.py:1593-1620). */
  case class WithRepeat(joinWith: String = " ", seed: Long)
      extends ExprMutator {
    override def mutated(c: Column, rid: Column, colIdx: Int): Column =
      concat(c, lit(joinWith), c)
  }

  // ----------------------------------------------------------------- M19
  /** Mutually exclusive mutator mixture per row (reference:
    * gecko/mutator.py:1641-1717): weights must sum to <= 1, padded with
    * noop (:1667-1677); each selected row draws one mutator index
    * (:1700-1703); each mutator is applied to its row-subset with p=1
    * (:1706-1713). Expression mutators compose into a single when()
    * plan — per row only the winning branch is evaluated, so this stays
    * one pass regardless of the mutator count. */
  case class WithGroup(mutators: Seq[(Double, Mutator)], seed: Long)
      extends Mutator {
    private val pSum = mutators.map(_._1).sum
    require(pSum <= 1 + 1e-12, s"sum of weights must not be higher than 1, is $pSum")
    require(pSum > 0, s"sum of weights must be higher than 0, is $pSum")
    mutators.zipWithIndex.foreach { case ((w, _), i) =>
      require(w > 0,
        s"weight of mutator at index $i must be higher than zero, is $w")
    }
    private val padded: Seq[(Double, Mutator)] =
      if (math.abs(pSum - 1.0) < 1e-12) mutators
      else mutators :+ ((1.0 - pSum, WithNoop(): Mutator))
    private val cum: Array[Double] =
      padded.map(_._1).scanLeft(0.0)(_ + _).tail.toArray.updated(
        padded.size - 1, 1.0)

    override def applyToColumn(df: DataFrame, colName: String, colIdx: Int,
                               sel: Column, rid: Column): DataFrame =
      throw new UnsupportedOperationException(
        "WithGroup applies sub-mutators directly")

    override def applyWithStats(df: DataFrame, cols: Seq[String], p: Double,
                                rid: Column,
                                stats: Seq[Seq[Any]]): DataFrame = {
      Gecko.checkProbability(p)
      val rowSel = draw(rid, 0, 0) < lit(p)
      val mutIdx = Rand.weightedPick(draw(rid, 0, 1), cum)
      padded.zipWithIndex.foldLeft(df) { case (d, ((_, m), i)) =>
        m match {
          case _: WithNoop => d
          case _ =>
            val sel = rowSel && (mutIdx === i)
            cols.zipWithIndex.foldLeft(d) { case (dd, (c, ci)) =>
              m.applyToColumn(dd, c, ci, sel, rid)
            }
        }
      }
    }
  }
}
