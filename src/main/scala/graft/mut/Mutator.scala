package graft.mut

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{Gecko, Rand, Warnings}

/** A mutator rewrites the given string columns of a DataFrame so that
  * an expected fraction p of ALL rows ends up mutated (the reference
  * Mutator alias — reference: gecko/_typedefs.py:7). Like the
  * reference, a mutator treats each of its assigned columns
  * independently (each `_mutate` maps `_mutate_series` over the list —
  * e.g. mutator.py:114-116) unless documented otherwise (permute).
  *
  * p-protocol (canonical reference instance mutator.py:601-616):
  * 1. compute per-column eligibility;
  * 2. pActual = eligible/total — one Spark agg job (driver-side, so the
  *    GeckoWarning analog can fire eagerly like the reference's);
  * 3. select eligible rows with probability min(1, p/pActual) so the
  *    overall mutated fraction ≈ p;
  * 4. rewrite only selected rows via a codegen'd when() expression.
  *
  * Every mutator takes a `seed`; chained mutators must be given
  * distinct seeds (the reference threads one shared RNG through a
  * script instead — docs/index.md:126-127). Randomness derives from a
  * caller-supplied unique row-id column, never from partition layout.
  */
trait Mutator {
  def seed: Long

  /** Max random draws used per column; draw indices are laid out as
    * colIdx * drawsPerColumn + k. Draw 0 is the selection draw. */
  protected def drawsPerColumn: Int = 8

  protected final def draw(rid: Column, colIdx: Int, k: Int): Column =
    Rand.uniform(rid, seed, colIdx * drawsPerColumn + k)

  /** Eligibility predicate for a value of this column, or None when all
    * rows are eligible. */
  def eligible(c: Column): Option[Column] = None

  /** Aggregate expressions this mutator must evaluate over the input
    * before it can build its rewrite of `colName`: the p-protocol
    * eligibility rate (the reference's mask.sum()/len —
    * mutator.py:603-607), plus mutator-specific extras (M4's per-source
    * match counts). [[MutateDataFrame]] fuses the aggs of every
    * (mutator, column) in a spec into ONE agg job; a standalone
    * [[apply]] fuses across its own columns. */
  def statsAggs(colName: String): Seq[Column] =
    eligible(col(colName))
      .map(e => Seq(avg(e.cast("double")))).getOrElse(Seq.empty)

  /** Rewrite one column for exactly the rows where `sel` holds (and are
    * eligible — implementations must keep ineligible rows unchanged
    * even if selected, as group mutation can select any row). */
  def applyToColumn(df: DataFrame, colName: String, colIdx: Int,
                    sel: Column, rid: Column): DataFrame

  /** [[applyToColumn]] variant receiving this column's [[statsAggs]]
    * results; mutators whose rewrite itself needs stats (M4) override
    * this, everyone else ignores the stats here. */
  protected def applyToColumnWithStats(df: DataFrame, colName: String,
                                       colIdx: Int, sel: Column, rid: Column,
                                       stats: Seq[Any]): DataFrame =
    applyToColumn(df, colName, colIdx, sel, rid)

  /** Reference name used in warnings — the reference's snake_case
    * operator name (with_delete, with_missing_value, …), derived from
    * the class name; mutators whose reference name differs (e.g.
    * with_cldr_keymap_file) override. */
  def name: String = getClass.getSimpleName.stripSuffix("$")
    .replaceAll("(?<=[a-z0-9])(?=[A-Z])", "_").toLowerCase

  /** Standard entry point: p-protocol over each column independently,
    * with all columns' stats fused into (at most) one agg job. */
  final def apply(df: DataFrame, cols: Seq[String], p: Double,
                  rid: Column): DataFrame =
    applyWithStats(df, cols, p, rid, Mutator.computeStats(df, this, cols))

  /** Entry point with precomputed stats — stats(i) holds the results of
    * `statsAggs(cols(i))`, in order. Mutators that treat their columns
    * jointly (permute, generator, group) override THIS method. */
  def applyWithStats(df: DataFrame, cols: Seq[String], p: Double,
                     rid: Column, stats: Seq[Seq[Any]]): DataFrame = {
    Gecko.checkProbability(p)
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val sel = selectionFor(c, i, p, rid, stats(i))
      applyToColumnWithStats(d, c, i, sel, rid, stats(i))
    }
  }

  /** Selection mask for one column under the p-protocol, from the
    * precomputed eligibility rate (stats head, when eligibility-gated). */
  protected def selectionFor(colName: String, colIdx: Int, p: Double,
                             rid: Column, stats: Seq[Any]): Column = {
    val u = draw(rid, colIdx, 0)
    eligible(col(colName)) match {
      case None => u < lit(p)
      case Some(e) =>
        val pActual = stats.headOption match {
          case Some(d: java.lang.Double) => d.doubleValue()
          case _ => 0.0 // empty input: avg over zero rows is null
        }
        if (pActual < p) Warnings.warnP(name, p, pActual)
        if (pActual == 0.0) lit(false)
        else u < lit(math.min(1.0, p / pActual)) && e
    }
  }
}

object Mutator {
  /** Run every statsAggs of (mutator, column) pairs as ONE agg job and
    * slice the single result row back per pair. Zero jobs when no pair
    * needs stats. */
  private[mut] def computeStats(df: DataFrame,
                                pairs: Seq[(Mutator, String)]): Seq[Seq[Any]] = {
    val aggs = pairs.map { case (m, c) => m.statsAggs(c) }
    val flat = aggs.flatten
    if (flat.isEmpty) aggs.map(_ => Seq.empty[Any])
    else {
      val row = df.agg(flat.head, flat.tail: _*).head()
      var off = 0
      aggs.map { as =>
        val vals: Seq[Any] = (off until off + as.size).map(row.get)
        off += as.size
        vals
      }
    }
  }

  private[mut] def computeStats(df: DataFrame, m: Mutator,
                                cols: Seq[String]): Seq[Seq[Any]] =
    computeStats(df, cols.map(c => (m, c)))
}

/** Mutator fully described by a per-value column expression — stays
  * inside whole-stage codegen, no UDFs, no extra jobs beyond the
  * p-protocol stats pass. */
trait ExprMutator extends Mutator {
  /** Mutated value expression for one (already selected+eligible) row. */
  def mutated(c: Column, rid: Column, colIdx: Int): Column

  override def applyToColumn(df: DataFrame, colName: String,
                             colIdx: Int, sel: Column,
                             rid: Column): DataFrame = {
    val c = col(colName)
    val gate = eligible(c).map(sel && _).getOrElse(sel)
    df.withColumn(colName,
      when(gate, mutated(c, rid, colIdx)).otherwise(c))
  }
}

/** Top-level driver — the engine's `mutate_data_frame` (reference:
  * gecko/mutator.py:1724-1793). Folds the spec over the running output
  * so later mutators see earlier mutators' results
  * (mutator.py:1779-1791), building one logical plan; Catalyst
  * collapses the adjacent projections.
  *
  * Every mutator's p-protocol stats (eligibility rates, M4's rule
  * match counts) are fused into a SINGLE agg job over the spec's input
  * frame, so a k-mutator spec scans a 100 TB source once for stats +
  * once for the output instead of k+1 times. Documented deviation from
  * the reference: gecko recomputes each mutator's eligibility on the
  * running (already-mutated) frame (mutator.py:1779-1791); this engine
  * estimates all rates on the input snapshot. The rates only scale
  * selection probabilities (realized fraction ≈ p either way, since a
  * prior mutator perturbs at most its own p-fraction of rows);
  * per-value semantics are unchanged.
  *
  * @param ridCol unique row-identity column driving all randomness. For
  *   generated frames this is [[Gecko.RowId]]; for arbitrary frames
  *   pass any unique key column.
  */
object MutateDataFrame {

  /** Column side of a flexible spec entry: one name or several. */
  case class Cols(names: Seq[String])
  object Cols {
    import scala.language.implicitConversions
    implicit def one(name: String): Cols = Cols(Seq(name))
    implicit def many(names: Seq[String]): Cols = Cols(names)
  }

  /** Mutator side of a flexible spec entry, mirroring the reference's
    * accepted forms (mutator.py:1749-1777): a bare mutator (p=1), a
    * (p, mutator) pair, an unweighted list (each p=1), or a weighted
    * list. */
  case class Muts(weighted: Seq[(Double, Mutator)])
  object Muts {
    import scala.language.implicitConversions
    implicit def one(m: Mutator): Muts = Muts(Seq((1.0, m)))
    implicit def onePair(pm: (Double, Mutator)): Muts = Muts(Seq(pm))
    implicit def list(ms: Seq[Mutator]): Muts =
      Muts(ms.map(m => (1.0, m)))
    implicit def weightedList(ms: Seq[(Double, Mutator)]): Muts = Muts(ms)

    /** Lifts a `cols -> mutators` pair written in any accepted form —
      * Scala doesn't convert tuple components against the expected
      * type, so the pair itself converts. */
    implicit def entry[C, M](pair: (C, M))(
        implicit toCols: C => Cols, toMuts: M => Muts): (Cols, Muts) =
      (toCols(pair._1), toMuts(pair._2))
  }

  /** Reference-style flexible entry point:
    * {{{
    * MutateDataFrame.of(df,
    *   "name" -> WithInsert(seed = 1),                  // bare, p=1
    *   "city" -> (0.3 -> WithDelete(seed = 2)),          // weighted
    *   Seq("a", "b") -> Seq(m1, m2),                     // list, p=1
    *   "zip" -> Seq(0.2 -> m3, 0.1 -> m4))               // weighted list
    * }}} */
  def of(df: DataFrame, spec: (Cols, Muts)*): DataFrame =
    apply(df, spec.map { case (c, m) => (c.names, m.weighted) })

  /** @param cacheForStats persist the input before folding the spec so
    *   the (single, fused) stats agg job and the final action share one
    *   materialization — worth it only when the input lineage is
    *   expensive to recompute AND fits the cache; a plain parquet scan
    *   at 100 TB is better read twice. */
  def apply(df: DataFrame,
            spec: Seq[(Seq[String], Seq[(Double, Mutator)])],
            ridCol: String = Gecko.RowId,
            cacheForStats: Boolean = false): DataFrame = {
    spec.foreach { case (cols, mutators) =>
      cols.foreach { c =>
        if (!df.columns.contains(c))
          throw new IllegalArgumentException(
            s"column `$c` does not exist, must be one of " +
              s"`${df.columns.mkString(",")}`")
      }
      mutators.foreach { case (p, _) =>
        if (p <= 0 || p > 1)
          throw new IllegalArgumentException(
            "probability for mutator must be in range of (0, 1]")
      }
    }
    if (cacheForStats) df.persist()
    val rid = col(ridCol)

    // ONE stats job for the whole spec (0 jobs if nothing needs stats)
    val pairs = for {
      (cols, mutators) <- spec
      (_, m) <- mutators
      c <- cols
    } yield (m, c)
    val statsIter = Mutator.computeStats(df, pairs).iterator

    // Safety valve for the snapshot estimate: when a LATER mutator's
    // eligibility was created by an earlier mutator in the spec (e.g.
    // uppercase-then-lowercase), the snapshot rate reads 0 and would
    // hard-disable the mutator with a bogus p-unmet warning. Detect
    // exactly that case — zero snapshot rate on an already-touched
    // column — and recompute that one mutator's stats on the running
    // frame (one extra job only in this rare shape; partial drift on
    // non-zero rates remains the documented deviation).
    val touched = scala.collection.mutable.Set[String]()
    spec.foldLeft(df) { case (d, (cols, mutators)) =>
      val out = mutators.foldLeft(d) { case (dd, (p, m)) =>
        val snapshot = cols.map(_ => statsIter.next())
        val zeroOnTouched = cols.zip(snapshot).exists { case (c, st) =>
          touched.contains(c) && (st.headOption match {
            case Some(d: java.lang.Double) => d.doubleValue() == 0.0
            case Some(null) => true
            case _ => false
          })
        }
        val stats =
          if (zeroOnTouched) Mutator.computeStats(dd, m, cols)
          else snapshot
        val next = m.applyWithStats(dd, cols, p, rid, stats)
        touched ++= cols
        next
      }
      out
    }
  }
}
