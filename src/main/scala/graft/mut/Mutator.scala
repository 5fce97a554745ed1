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

  /** Rewrite one column for exactly the rows where `sel` holds (and are
    * eligible — implementations must keep ineligible rows unchanged
    * even if selected, as group mutation can select any row). */
  def applyToColumn(df: DataFrame, colName: String, colIdx: Int,
                    sel: Column, rid: Column): DataFrame

  /** Reference name used in warnings. */
  def name: String = getClass.getSimpleName.stripSuffix("$")

  /** Standard entry point: p-protocol over each column independently. */
  def apply(df: DataFrame, cols: Seq[String], p: Double,
            rid: Column): DataFrame = {
    Gecko.checkProbability(p)
    cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val sel = selectionFor(d, c, i, p, rid)
      applyToColumn(d, c, i, sel, rid)
    }
  }

  /** Selection mask for one column under the p-protocol. */
  protected def selectionFor(df: DataFrame, colName: String, colIdx: Int,
                             p: Double, rid: Column): Column = {
    val u = draw(rid, colIdx, 0)
    eligible(col(colName)) match {
      case None => u < lit(p)
      case Some(e) =>
        val pActual = eligibleRate(df, e)
        if (pActual < p) Warnings.warnP(name, p, pActual)
        if (pActual == 0.0) lit(false)
        else u < lit(math.min(1.0, p / pActual)) && e
    }
  }

  /** One agg job for the p-protocol stats pass (the reference's
    * mask.sum()/len — mutator.py:603-607). */
  protected def eligibleRate(df: DataFrame, e: Column): Double = {
    val row = df.agg(avg(e.cast("double"))).head()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }
}

/** Mutator fully described by a per-value column expression — stays
  * inside whole-stage codegen, no UDFs, no extra jobs beyond the
  * p-protocol stats pass. */
trait ExprMutator extends Mutator {
  /** Mutated value expression for one (already selected+eligible) row. */
  def mutated(c: Column, rid: Column, colIdx: Int): Column

  final override def applyToColumn(df: DataFrame, colName: String,
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
  * @param ridCol unique row-identity column driving all randomness. For
  *   generated frames this is [[Gecko.RowId]]; for arbitrary frames
  *   pass any unique key column.
  */
object MutateDataFrame {

  /** @param cacheForStats persist the input before folding the spec so
    *   the per-mutator p-protocol stats aggregations (one job each) hit
    *   memory instead of re-scanning the source — worth it when the
    *   input is an expensive scan (100 TB parquet) and several chained
    *   mutators have eligibility predicates. The caller owns
    *   unpersisting the input after the final action. */
  def apply(df: DataFrame,
            spec: Seq[(Seq[String], Seq[(Double, Mutator)])],
            ridCol: String = Gecko.RowId,
            cacheForStats: Boolean = false): DataFrame = {
    if (cacheForStats) df.persist()
    val rid = col(ridCol)
    spec.foldLeft(df) { case (d, (cols, mutators)) =>
      cols.foreach { c =>
        if (!d.columns.contains(c))
          throw new IllegalArgumentException(
            s"column `$c` does not exist, must be one of " +
              s"`${df.columns.mkString(",")}`")
      }
      mutators.foldLeft(d) { case (dd, (p, m)) =>
        if (p <= 0 || p > 1)
          throw new IllegalArgumentException(
            "probability for mutator must be in range of (0, 1]")
        m(dd, cols, p, rid)
      }
    }
  }
}
