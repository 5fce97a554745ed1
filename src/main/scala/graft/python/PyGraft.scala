package graft.python

import java.util.{List => JList}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gen.{Generator, Generators, ToDataFrame}
import graft.mut.{MutateDataFrame, Mutator, Mutators, RuleMutators}

/** py4j-friendly facade over the Layer A API (generators G1–G8,
  * mutators M1–M20) for the PySpark wrapper in `python/graft.py`.
  *
  * The reference library's whole audience calls it from Python
  * (gecko/generator.py:6-15, docs/index.md:57-61); this object is the
  * JVM side of that bridge. Every method takes only py4j-native types
  * (primitives, String, java.util.List) and returns opaque
  * [[graft.gen.Generator]] / [[graft.mut.Mutator]] handles the Python
  * side threads back into [[toDataFrame]] / [[mutate]] — the same
  * fused one-scan / one-stats-job plans as the Scala API, because it
  * IS the Scala API.
  *
  * Determinism contract: a Python pipeline and the equivalent Scala
  * pipeline produce byte-identical rows (same seeds, any partition
  * count) — asserted by scripts/py_roundtrip_test.py.
  */
object PyGraft {

  // ------------------------------------------------------ generators

  def fromUniform(low: Double, high: Double, precision: Int,
                  seed: Long): Generator =
    Generators.FromUniformDistribution(low, high, precision, seed)

  def fromNormal(mean: Double, sd: Double, precision: Int,
                 seed: Long): Generator =
    Generators.FromNormalDistribution(mean, sd, precision, seed)

  def fromDatetimeRange(startDt: String, endDt: String, dtFormat: String,
                        unit: String, seed: Long): Generator =
    Generators.FromDatetimeRange(startDt, endDt, dtFormat, unit, seed)

  /** G4 from a DataFrame (single value column). */
  def fromFrequencyTable(df: DataFrame, valueColumn: String,
                         freqColumn: String, seed: Long): Generator =
    Generators.fromFrequencyTable(df.sparkSession, df, valueColumn,
      freqColumn, seed)

  /** G4 from a CSV path; column refs by NAME (header row expected). */
  def fromFrequencyTableCsv(spark: SparkSession, path: String,
                            valueColumn: String, freqColumn: String,
                            delimiter: String, encoding: String,
                            seed: Long): Generator =
    Generators.fromFrequencyTable(spark, path, Right(valueColumn),
      Right(freqColumn), delimiter, seed, encoding)

  /** G5 joint multicolumn table from a DataFrame. */
  def fromMulticolumnFrequencyTable(df: DataFrame,
                                    valueColumns: JList[String],
                                    freqColumn: String,
                                    seed: Long): Generator =
    Generators.fromMulticolumnFrequencyTable(df.sparkSession, df,
      valueColumns.asScala.toSeq, freqColumn, seed)

  /** G7 weighted mixture; `weights` and `gens` are parallel lists. */
  def fromGroup(weights: JList[java.lang.Double], gens: JList[Generator],
                maxRoundingAdjustment: Int, seed: Long): Generator =
    Generators.FromGroup(
      weights.asScala.map(_.doubleValue()).toSeq
        .zip(gens.asScala.toSeq),
      maxRoundingAdjustment, seed)

  /** G8 — `names` and `gens` are parallel lists; names.get(i) holds
    * the column names generator i fills (arity-checked downstream). */
  def toDataFrame(spark: SparkSession, names: JList[JList[String]],
                  gens: JList[Generator], n: Long): DataFrame =
    ToDataFrame(spark,
      names.asScala.toSeq.map(_.asScala.toSeq)
        .zip(gens.asScala.toSeq), n)

  // -------------------------------------------------------- mutators

  def withMissingValue(value: String, seed: Long): Mutator =
    Mutators.WithMissingValue(value, seed)

  def withInsert(charset: String, seed: Long): Mutator =
    Mutators.WithInsert(charset, seed)

  /** [[withInsert]] with the default ASCII charset. */
  def withInsertAscii(seed: Long): Mutator = Mutators.WithInsert(seed = seed)

  def withDelete(seed: Long): Mutator = Mutators.WithDelete(seed)

  def withTranspose(seed: Long): Mutator = Mutators.WithTranspose(seed)

  def withSubstitute(charset: String, seed: Long): Mutator =
    Mutators.WithSubstitute(charset, seed)

  def withSubstituteAscii(seed: Long): Mutator =
    Mutators.WithSubstitute(seed = seed)

  def withNoop(): Mutator = Mutators.WithNoop()

  def withCategoricalValues(values: JList[String], seed: Long): Mutator =
    Mutators.WithCategoricalValues(values.asScala.toSeq, seed)

  def withPermute(seed: Long): Mutator = Mutators.WithPermute(seed)

  def withLowercase(seed: Long): Mutator = Mutators.WithLowercase(seed)

  def withUppercase(seed: Long): Mutator = Mutators.WithUppercase(seed)

  def withDatetimeOffset(maxDelta: Int, unit: String, dtFormat: String,
                         preventWraparound: Boolean, seed: Long): Mutator =
    Mutators.WithDatetimeOffset(maxDelta, unit, dtFormat,
      preventWraparound, seed)

  def withRepeat(joinWith: String, seed: Long): Mutator =
    Mutators.WithRepeat(joinWith, seed)

  def withGenerator(gen: Generator, mode: String, joinWith: String,
                    seed: Long): Mutator =
    Mutators.WithGenerator(gen, mode, joinWith, seed)

  /** M4 — `sources`/`targets` are parallel lists of rule pairs. */
  def withReplacementTable(sources: JList[String], targets: JList[String],
                           inline: Boolean, reverse: Boolean,
                           seed: Long): Mutator =
    RuleMutators.WithReplacementTable(
      sources.asScala.toSeq.zip(targets.asScala.toSeq),
      inline, reverse, seed)

  /** M3 — parallel (source, target, flags) lists; flags ∈ {^,$,_} or
    * empty for all three. */
  def withPhoneticReplacementTable(sources: JList[String],
                                   targets: JList[String],
                                   flags: JList[String],
                                   seed: Long): Mutator =
    RuleMutators.WithPhoneticReplacementTable(
      sources.asScala.toSeq.lazyZip(targets.asScala.toSeq)
        .lazyZip(flags.asScala.toSeq).toSeq,
      seed)

  /** M17 from a rule DataFrame — the pattern column plus one column
    * per capture group (numbered or named); empty `flagsColumn` means
    * no flags column. Pure config, no callable crosses the bridge
    * (reference: gecko/mutator.py:1444-1590). */
  def withRegexReplacementTable(df: DataFrame, patternColumn: String,
                                flagsColumn: String,
                                seed: Long): Mutator =
    RuleMutators.WithRegexReplacementTable(df, patternColumn,
      if (flagsColumn == null || flagsColumn.isEmpty) None
      else Some(flagsColumn),
      seed)

  /** M17 CSV-path variant (header row names the columns). */
  def withRegexReplacementTableCsv(spark: SparkSession, path: String,
                                   patternColumn: String,
                                   flagsColumn: String, encoding: String,
                                   delimiter: String,
                                   seed: Long): Mutator =
    RuleMutators.WithRegexReplacementTable.fromCsv(spark, path,
      patternColumn,
      if (flagsColumn == null || flagsColumn.isEmpty) None
      else Some(flagsColumn),
      encoding, delimiter, seed)

  def withCldrKeymapFile(path: String, charset: String,
                         seed: Long): Mutator =
    RuleMutators.WithCldrKeymap(path,
      if (charset == null || charset.isEmpty) None else Some(charset),
      seed)

  /** M19 — mutually-exclusive weighted group. */
  def withGroup(probs: JList[java.lang.Double], muts: JList[Mutator],
                seed: Long): Mutator =
    Mutators.WithGroup(
      probs.asScala.map(_.doubleValue()).toSeq
        .zip(muts.asScala.toSeq),
      seed)

  /** M20 — the spec is flattened for py4j: entry i mutates column
    * group `colGroups.get(i)` with the parallel (probs, muts) lists. */
  def mutate(df: DataFrame,
             colGroups: JList[JList[String]],
             probs: JList[JList[java.lang.Double]],
             muts: JList[JList[Mutator]]): DataFrame = {
    val spec = colGroups.asScala.toSeq.zipWithIndex.map { case (cols, i) =>
      cols.asScala.toSeq ->
        probs.get(i).asScala.map(_.doubleValue()).toSeq
          .zip(muts.get(i).asScala.toSeq)
    }
    MutateDataFrame(df, spec)
  }

  // ----------------------------------------- Layer B (config-only ops)
  /** Layer B bridge for the Python wrapper: run a gate query by its
    * `SparkEntry.queries` key against an sf-layout table directory.
    * Config-only, no Python callables cross py4j — the returned
    * handle is a plain DataFrame the Python side wraps. The named
    * python functions (`graft.dedup_exact`, `graft.bm25_topk`, …)
    * are the user surface; this is their one transport. Unknown keys
    * fail loudly with the full key list kept out of the message
    * (600+ entries). */
  def runQuery(spark: SparkSession, name: String, dir: String)
      : DataFrame =
    graft.SparkEntry.queries.get(name) match {
      case Some(fn) => fn(spark, dir)
      case None => throw new IllegalArgumentException(
        s"unknown gate query '$name' — see SparkEntry.queries")
    }
}
