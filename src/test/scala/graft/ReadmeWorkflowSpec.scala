package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Gecko
import graft.gen.{Generators, ToDataFrame}
import graft.mut.{MutateDataFrame, Mutators}

/** End-to-end reproduction of the reference's README workflow
  * (reference README.md:55-81): 10k rows sampled from a frequency-table
  * CSV into a `last_name` column, a mutated copy with 1% character
  * deletions, both exported to CSV — byte-identical across runs and
  * partition counts (the engine's reproducibility contract,
  * SURVEY.md §7 build step 2). */
class ReadmeWorkflowSpec extends SparkSpec {

  test("reference README workflow end to end") {
    val freqCsv = getClass.getResource("/assets/freq-fruits.csv").getPath

    def pipeline(): (DataFrame, DataFrame) = {
      val generated = ToDataFrame(spark, Seq(
        Seq("last_name") -> Generators.fromFrequencyTable(spark, freqCsv,
          Right("fruit"), Right("count"), ",", seed = 727)), 10000L)
      val mutated = MutateDataFrame(generated, Seq(
        Seq("last_name") -> Seq(
          (0.01, Mutators.WithDelete(seed = 728): graft.mut.Mutator))))
      (generated, mutated)
    }

    def values(df: DataFrame): Array[String] =
      df.orderBy(Gecko.RowId).select("last_name")
        .collect().map(_.getString(0))

    val (gen1, mut1) = pipeline()
    val (g1, m1) = (values(gen1), values(mut1))
    val (gen2, mut2) = pipeline()

    // shape: 10k rows, values from the frequency table's support
    assert(g1.length == 10000)
    assert(g1.toSet == Set("apple", "banana", "orange"))
    // ~1% of rows got a single-character deletion
    val changed = g1.zip(m1).count { case (a, b) => a != b }
    assert(changed > 50 && changed < 150, s"changed=$changed")
    assert(g1.zip(m1).forall { case (a, b) =>
      a == b || b.length == a.length - 1
    })
    // byte-identical across runs
    assert(g1.sameElements(values(gen2)) && m1.sameElements(values(mut2)))

    // CSV export + read-back (the reference delegates to to_csv);
    // repartition proves partition-layout independence
    val dir = java.nio.file.Files.createTempDirectory("readme-wf")
    mut1.repartition(8)
      .write.option("header", "true").csv(s"$dir/mutated")
    val back = spark.read.option("header", "true").csv(s"$dir/mutated")
      .orderBy(col(Gecko.RowId).cast("long"))
      .select("last_name").collect().map(_.getString(0))
    assert(back.sameElements(m1))
  }
}
