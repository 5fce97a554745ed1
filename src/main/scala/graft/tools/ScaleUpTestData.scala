package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale a driver-generated sf directory by an integer
  * factor, preserving join semantics — each copy shifts every key /
  * foreign-key column by `copy * Stride`, so per-key group sizes,
  * join fan-outs, and selectivities stay constant while row counts
  * multiply (the honest way to extrapolate the sf0.1 bench to sf1:
  * real TPC-H scaling also grows entity counts, not group sizes).
  * Dimension tables (region/nation) stay fixed, like TPC-H.
  *
  * Usage: runMain graft.tools.ScaleUpTestData <srcSfDir> <outDir> <factor>
  */
object ScaleUpTestData {

  /** Far above every key in any sf dir (max 149,999 at sf0.1) AND
    * above Dedup's planted-id offsets (2e6), so shifted KEYS never
    * collide across copies — while keeping copy·Stride + key ≤ 9
    * digits for every factor ≤ 99, which [[RederiveName]] requires.
    * NOTE: query-time id offsets must not be congruent to 0 mod this
    * Stride, or copy i's offset ids land on copy i+1's raw ids —
    * Linkage.RecOffset (5e6) is chosen against this constraint; see
    * its scaladoc (the r9 RecOffset == Stride collision chained all
    * copies of a customer into one entity-resolution cluster). */
  private val Stride = 10000000L

  private val ShiftCols: Seq[(String, Seq[String])] = Seq(
    "region" -> Seq.empty,
    "nation" -> Seq.empty,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Key-DERIVED string columns, re-derived from the SHIFTED key per
    * copy (TPC-H's own rule: `c_name = 'Customer#%09d'`). Without
    * this, copies carry the source names VERBATIM, so every
    * name-derived blocking/grouping key collides factor× more than
    * real TPC-H growth — at sf3 the linkage sweep was measuring a
    * quadratic same-name artifact, not the blocking plan
    * (BASELINE.md's r8 caveat; fixed r9). The shifted keys stay
    * ≤ 9 digits for every factor ≤ 99 (shift = copy · [[Stride]]),
    * so the %09d width — and with it every prefix/suffix/length
    * blocking key's SHAPE — is preserved. */
  private val RederiveName: Map[String, (String, String)] = Map(
    "customer" -> ("c_name", "Customer#"),
    "supplier" -> ("s_name", "Supplier#"))

  /** Copies of `documents` perturb the TEXT column with the engine's
    * own Layer A mutators (seeded per copy) instead of carrying it
    * verbatim. Verbatim replication made every scaled text-similarity
    * row partly a measurement of the harness: exact-rep staging
    * collapsed the copies back to the source corpus (st30's streamed
    * corpus was SF-invariant) while candidate-generation paths that
    * see raw rows (t42's eval×train probe) blew up on replica
    * candidates (8.8× time at 30× data — the r12 verdict's top
    * residual). A seeded single-char delete + substitute at p≈0.05
    * each makes every copy an honest near-duplicate population: ~10%
    * of each copy's docs differ from the source, distinct per copy,
    * deterministic per (copy, doc). Copy 0 stays VERBATIM — the
    * scaled dir remains a superset of the source corpus, and planted
    * structures are unaffected because every dedup/decon demo plants
    * at QUERY time from whatever text the row carries. n_chars is
    * re-derived so the metadata invariant (n_chars == length(text))
    * survives. NOTE: sf-scaled oracles for text-family ops must be
    * regenerated against the perturbed dirs — sf-scaled text results
    * are NOT comparable across harness versions. */
  private def perturbDocuments(df: org.apache.spark.sql.DataFrame,
      copy: Int): org.apache.spark.sql.DataFrame = {
    if (copy == 0) df
    else {
      val mutated = graft.mut.MutateDataFrame(df, Seq(
        Seq("text") -> Seq(
          0.05 -> graft.mut.Mutators.WithDelete(
            seed = 7000L + copy),
          0.05 -> graft.mut.Mutators.WithSubstitute(
            seed = 8000L + copy))),
        ridCol = "doc_id")
      mutated.withColumn("n_chars", length(col("text")).cast("long"))
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 1, s"factor must be >= 1, is $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events carries TIMESTAMP(NANOS): read as raw long nanos (the
      // engine's loader handles the long form identically)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ShiftCols.foreach { case (table, shifts) =>
      val df = spark.read.parquet(s"$srcDir/$table.parquet")
      val out =
        if (shifts.isEmpty) df
        else (0 until factor).map { i =>
          val shifted = shifts.foldLeft(df) { (d, c) =>
            d.withColumn(c, col(c) + lit(i * Stride))
          }
          val renamed = RederiveName.get(table).fold(shifted) {
            case (nameCol, prefix) => shifted.withColumn(nameCol,
              format_string(s"$prefix%09d", col(shifts.head)))
          }
          if (table == "documents") perturbDocuments(renamed, i)
          else renamed
        }.reduce(_.unionAll(_))
      out.repartition(32).write.mode("overwrite")
        .parquet(s"$outDir/$table.parquet")
      println(s"[scaleup] $table x$factor -> $outDir/$table.parquet")
    }
    spark.stop()
  }
}
