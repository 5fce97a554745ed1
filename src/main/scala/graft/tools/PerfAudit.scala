package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool backing the BASELINE.md heavy-tail audits: measures the
  * structural drivers of the suite's most expensive rows so their
  * cost is attributable to DATA SHAPE, not guessed at.
  *
  *  - `d06`: candidate-pair volume entering cluster formation (the
  *    d02 LSH pair stream), the distinct-node/edge counts after
  *    canonicalization, and the star-contraction round count.
  *  - `gr03 <cap>`: wedge volume and wall time of the triangle count
  *    at a given per-order fanout cap (the gr03 cost knob).
  *
  * Usage: runMain graft.tools.PerfAudit <sfDir> d06|gr03 [cap]
  */
object PerfAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val what = args(1)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    spark.sparkContext.setLogLevel("WARN")
    what match {
      case "d06" => d06(spark, sfDir)
      case "gr03" => gr03(spark, sfDir, args(2).toInt)
      case "d13" => d13(spark, sfDir)
      case other => sys.error(s"unknown audit: $other")
    }
    spark.stop()
  }

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[audit] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  private def d06(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val pairs = timed("d02 pair generation (count)") {
      graft.queries.Dedup.dedupMinhashLsh(s, dir).cache()
    }
    println(s"[audit] d06 candidate pairs: ${pairs.count()}")
    val canon = pairs.select(
        greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    println(s"[audit] d06 distinct canonical edges: ${canon.count()}")
    println("[audit] d06 distinct nodes: " +
      pairs.select(col("a").as("n"))
        .unionAll(pairs.select(col("b").as("n"))).distinct().count())
    val t0 = System.nanoTime()
    val (labels, rounds) =
      graft.queries.Dedup.clusterPairsCounted(pairs)
    val n = labels.count()
    println(f"[audit] d06 star contraction: $rounds rounds, " +
      f"$n labels, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    pairs.unpersist()
  }

  private def d13(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val toks = split(col("text"), " ")
    val docs = graft.queries.Relational.table(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.filter(col("doc_id") % 7 === 0)
      .filter(size(toks) >= 6)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), (size(toks) / 2).cast("int")))
          .as("text"))
    val corpus = docs.unionAll(planted).filter(size(toks) >= 3)
    // same shape as the shipped query: tokenize once, index the array
    val grams = corpus
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, size(toks) - 2), i -> " +
            "concat_ws(' ', element_at(toks, i), " +
            "element_at(toks, i + 1), element_at(toks, i + 2)))")))
          .as("gram"))
    timed("gram build (count only)") {
      println("  grams: " + grams.count())
    }
    val cached = grams.persist()
    timed("gram build + persist") { println("  grams: " + cached.count()) }
    val df2 = cached.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("gram")
    timed("df>=2 sliver") { println("  df>=2 grams: " + df2.count()) }
    val postings = cached.join(df2, Seq("gram"), "left_semi")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("gram").orderBy("doc_id")))
      .filter(col("rn") <= 8).drop("rn")
    timed("postings (semi-join + window)") {
      println("  postings: " + postings.count())
    }
    val candidates = postings.select(col("gram"), col("doc_id").as("a"))
      .join(postings.select(col("gram"), col("doc_id").as("b")), "gram")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct().persist()
    timed("candidates (posting self-join + distinct)") {
      println("  candidates: " + candidates.count())
    }
    val shared = candidates
      .join(cached.select(col("doc_id").as("a"), col("gram")), "a")
      .join(cached.select(col("doc_id").as("b_doc"),
          col("gram").as("gram_b")),
        col("b") === col("b_doc") && col("gram") === col("gram_b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared_grams"))
    timed("verify (2 gram joins + agg)") {
      println("  shared rows: " + shared.count())
    }
    candidates.unpersist()
    val t0 = System.nanoTime()
    val full = graft.queries.Dedup.containmentDedup(s, dir)
    println(f"[audit] full d13 (cold, incl. above cache released): " +
      f"${full.count()} pairs, ${(System.nanoTime() - t0) / 1e9}%.2f s")
    cached.unpersist()
  }

  private def gr03(s: SparkSession, dir: String, cap: Int): Unit = {
    val t0 = System.nanoTime()
    val n = graft.queries.Graph.trianglesWithCap(s, dir, cap).count()
    println(f"[audit] gr03 cap=$cap: $n nodes with triangles, " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
