package graft.tools

/** Dev tool: measure the BPE merge-count envelope — the in-plan
  * 3-round demo loop (one Spark job per merge) vs the production
  * driver-side trainer (2 corpus jobs TOTAL for any merge count;
  * `TextAnalysis.bpeTrain`'s scaladoc). Numbers land in BASELINE.md.
  *
  * Usage: runMain graft.tools.BpeProbe <sfDir> [rounds]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors.toString).toInt)
    spark.sparkContext.setLogLevel("WARN")

    // warm the documents scan so both measurements price the loop,
    // not the first-touch file listing
    graft.queries.Relational.table(spark, sfDir, "documents").count()

    val t0 = System.nanoTime()
    val demo = graft.queries.TextAnalysis.bpeMerges(spark, sfDir).collect()
    val demoSec = (System.nanoTime() - t0) / 1e9
    println(f"[bpe] in-plan loop, ${demo.length} merges: $demoSec%.2f s " +
      f"(${demoSec / demo.length}%.2f s/merge — one job per merge)")

    val t1 = System.nanoTime()
    val rules = graft.queries.TextAnalysis.bpeTrain(spark, sfDir, rounds)
    val trainSec = (System.nanoTime() - t1) / 1e9
    println(f"[bpe] driver-side trainer, ${rules.length} merges: " +
      f"$trainSec%.2f s TOTAL (one vocab job + in-memory rounds)")
    rules.foreach { case (r, _, merged, cnt) =>
      println(s"[bpe]   round $r: '${merged.replace("\u001f", "")}' " +
        s"(pairs $cnt)")
    }
    spark.stop()
  }
}
