package graft.tools

import org.apache.spark.sql.SparkSession

import graft.gen.{Generators, ToDataFrame}
import graft.mut.{MutateDataFrame, Mutators, RuleMutators}

/** Dev tool: dump the README example pipeline (10k rows, generate →
  * mutate) to parquet from SCALA, so scripts/py_roundtrip_test.py can
  * assert the PySpark wrapper reproduces it byte-identically — the
  * cross-language determinism contract of the Layer A API.
  *
  * Usage: runMain graft.tools.PyParityDump <outDir>
  */
object PyParityDump {

  val N = 10000L

  /** The M17 fixture the wrapper-parity run shares with RuleMutatorSpec
    * (committed CSV, repo-relative so both languages read one file). */
  val RegexCsv = "src/test/resources/assets/regex-foobar-case-insensitive.csv"

  def run(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val freq = Seq(("consumer", 6L), ("corporate", 3L), ("household", 1L))
      .toDF("value", "freq")
    val words = Seq(("foobar", 5L), ("FooBar", 3L), ("quux", 2L))
      .toDF("value", "freq")
    val df = ToDataFrame(spark, Seq(
      Seq("segment") -> Generators.fromFrequencyTable(spark, freq,
        "value", "freq", seed = 1),
      Seq("dob") -> Generators.FromDatetimeRange("1940-01-01", "2005-12-31",
        "%Y-%m-%d", "d", seed = 2),
      Seq("score") -> Generators.FromUniformDistribution(0.0, 100.0, 2,
        seed = 5),
      Seq("word") -> Generators.fromFrequencyTable(spark, words,
        "value", "freq", seed = 7)), N)
    MutateDataFrame(df, Seq(
      Seq("dob") -> Seq(0.3 -> RuleMutators.WithReplacementTable(
        Seq("0" -> "o", "1" -> "|", "5" -> "s"), inline = true,
        reverse = false, seed = 3)),
      Seq("segment") -> Seq(0.2 -> Mutators.WithInsert(seed = 4)),
      Seq("word") -> Seq(0.5 -> RuleMutators.WithRegexReplacementTable
        .fromCsv(spark, RegexCsv, "pattern", Some("flags"), seed = 6))))
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    run(spark).orderBy("__row_id")
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
