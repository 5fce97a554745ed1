package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-timing probe for the gr03 triangle pipeline: times
  * each materialization boundary separately (warm, after one full
  * discard run) so the expensive stage is measured, not guessed.
  * Usage: runMain graft.tools.TriProbe <sfDir> [cap]
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cap = if (args.length > 1) args(1).toInt else 4
    val s = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    s.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warmup: full run once so JIT/scan caches are hot
    timed("full cold") {
      graft.queries.Graph.trianglesWithCap(s, dir, cap).count()
    }
    timed("full warm") {
      graft.queries.Graph.trianglesWithCap(s, dir, cap).count()
    }
    // stage replay, same shapes as trianglesPlan
    val pairBlocks = graft.queries.Relational.table(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(slice(array_sort(collect_set(col("l_partkey"))), 1, cap)
        .as("ps"))
      .select(expr(
        """flatten(transform(ps, (u, i) ->
             transform(slice(ps, i + 2, size(ps)), v ->
               struct(u AS u, v AS v))))""").as("pairs"))
    val edges = pairBlocks
      .select(explode(col("pairs")).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct().persist()
    timed("edges build+count")(println("edges=" + edges.count()))
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("c"))
    val du = deg.select(col("n").as("u"), col("c").as("cu"))
    val dv = deg.select(col("n").as("v"), col("c").as("cv"))
    val orient = edges.join(du, "u").join(dv, "v")
      .select(
        when(struct(col("cu"), col("u")) < struct(col("cv"), col("v")),
          col("u")).otherwise(col("v")).as("s"),
        when(struct(col("cu"), col("u")) < struct(col("cv"), col("v")),
          col("v")).otherwise(col("u")).as("d"))
      .persist()
    timed("orient build+count")(println("orient=" + orient.count()))
    val adj = orient.groupBy(col("s").as("n"))
      .agg(sort_array(collect_list(col("d"))).as("nbrs"))
      .persist()
    timed("adj build+count")(println("adj=" + adj.count()))
    println("wedge volume = " + adj.select(
      sum(expr("size(nbrs) * cast(size(nbrs) as bigint)"))).first())
    val closed = orient
      .join(adj.select(col("n").as("s"), col("nbrs").as("adj_s")), "s")
      .join(adj.select(col("n").as("d"), col("nbrs").as("adj_d")), "d")
      .select(col("s"), col("d"),
        array_intersect(col("adj_s"), col("adj_d")).as("common"))
      .filter(size(col("common")) > 0)
      .persist()
    timed("closing joins+intersect")(println("closed=" + closed.count()))
    val out = closed.select(col("s").as("node"),
        size(col("common")).cast("long").as("t"))
      .unionAll(closed.select(col("d").as("node"),
        size(col("common")).cast("long").as("t")))
      .unionAll(closed.select(explode(col("common")).as("node"),
        lit(1L).as("t")))
      .groupBy("node").agg(sum(col("t")).as("n_triangles"))
    timed("final agg")(println("nodes=" + out.count()))
    s.stop()
  }
}
