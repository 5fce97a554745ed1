package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Gecko

/** A column-expression factory: count in, DataFrame of string columns
  * out, keyed by a stable row id (the engine's analog of the reference
  * Generator alias `Callable[[int], list[pd.Series]]` — reference:
  * gecko/_typedefs.py:6).
  *
  * Design (SURVEY.md §7): generators are *expression-backed* wherever
  * possible — pure Catalyst column expressions over `spark.range(n)`
  * plus broadcast lookups — so that [[ToDataFrame]] can fuse an entire
  * multi-generator spec into ONE `range(n).select(...)` plan with zero
  * joins and zero shuffles, which scales linearly with executor count.
  * Only mixture generators ([[FromGroup]]) materialize their own frame.
  */
trait Generator {
  /** Number of columns this generator produces. */
  def arity: Int = 1

  /** True when [[exprs]] fully describes the generator (fusable). */
  def isExprBacked: Boolean = true

  /** Column expressions over the row-id column. Length == arity. */
  def exprs(rid: Column): Seq[Column]

  /** Standalone frame: __row_id plus c0..c{arity-1}. */
  def generate(spark: SparkSession, n: Long): DataFrame = {
    require(n > 0, s"amount of rows must be positive, is $n")
    val rid = col("id")
    spark.range(n).select(
      (rid.as(Gecko.RowId) +:
        exprs(rid).zipWithIndex.map { case (e, i) => e.as(s"c$i") }): _*)
  }
}

/** Assembles the final DataFrame from a `[(columnNames, generator)]`
  * spec — the engine's `to_data_frame` (reference:
  * gecko/generator.py:427-474), including the runtime arity check
  * (generator.py:462-467). */
object ToDataFrame {

  def apply(spark: SparkSession,
            spec: Seq[(Seq[String], Generator)],
            n: Long): DataFrame = {
    require(spec.nonEmpty, "generator list may not be empty")
    require(n > 0, s"amount of rows must be positive, is $n")

    val allNames = spec.flatMap(_._1)
    require(allNames.distinct.size == allNames.size,
      s"duplicate column names in spec: ${allNames.mkString(", ")}")

    spec.zipWithIndex.foreach { case ((names, gen), i) =>
      if (names.size != gen.arity)
        throw new IllegalArgumentException(
          s"generator at index $i generates ${gen.arity} columns, " +
            s"but ${names.size} column names were provided")
    }

    if (spec.forall(_._2.isExprBacked)) {
      // fused path: one range scan, zero joins
      val rid = col("id")
      val cols = spec.flatMap { case (names, gen) =>
        gen.exprs(rid).zip(names).map { case (e, name) => e.as(name) }
      }
      spark.range(n).select((rid.as(Gecko.RowId) +: cols): _*)
    } else {
      // general path: generate each, 1-1 equi-join on row id
      spec.map { case (names, gen) =>
        val df = gen.generate(spark, n)
        names.zipWithIndex.foldLeft(df) { case (d, (name, i)) =>
          d.withColumnRenamed(s"c$i", name)
        }
      }.reduce(_.join(_, Gecko.RowId))
    }
  }
}
