package graft

import org.apache.spark.sql.functions._
import graft.expr.CosineSimilarity
import graft.queries.Similarity

/** The native cosine expression: exact parity with the Scala kernel it
  * replaced (the ANN oracles depend on bit-identical ranks), codegen
  * participation, and null behavior. */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(seed: Int, n: Int, dim: Int = 64): Seq[Seq[Float]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(r.nextFloat() * 2 - 1))
  }

  test("bit-exact parity with Similarity.cosine across random vectors") {
    val xs = vecs(1, 200)
    val ys = vecs(2, 200)
    val got = xs.zip(ys).toDF("x", "y")
      .select(CosineSimilarity.cosineSimilarity(col("x"), col("y")))
      .collect().map(_.getDouble(0))
    val want = xs.zip(ys).map { case (x, y) => Similarity.cosine(x, y) }
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"codegen=$g kernel=$w") // exact, not approximate
    }
  }

  test("mismatched lengths use the common prefix; zero vector gives 0") {
    val df = Seq(
      (Seq(1f, 0f, 5f), Seq(1f, 0f)), // both norms over prefix [1,0]
      (Seq(0f, 0f), Seq(1f, 2f))
    ).toDF("x", "y")
      .select(CosineSimilarity.cosineSimilarity(col("x"), col("y")))
    val out = df.collect().map(_.getDouble(0))
    assert(out(0) == 1.0)
    assert(out(1) == 0.0)
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("x", "y")
      .select(CosineSimilarity.cosineSimilarity(col("x"), col("y")))
    assert(df.collect().head.isNullAt(0))
  }

  test("SQL registration: cosine_similarity usable from spark.sql") {
    graft.GraftExtensions.register(spark)
    Seq((Seq(1f, 2f, 3f), Seq(3f, 2f, 1f))).toDF("x", "y")
      .createOrReplaceTempView("cos_in")
    val viaSql = spark.sql(
      "SELECT cosine_similarity(x, y) AS c FROM cos_in").head.getDouble(0)
    assert(viaSql == Similarity.cosine(Seq(1f, 2f, 3f), Seq(3f, 2f, 1f)))
  }

  test("ANN re-rank paths carry no cosine ScalaUDF in the plan") {
    for (q <- Seq(Similarity.annBruteForce(spark, sfDir),
        Similarity.annIvf(spark, sfDir))) {
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("cosine_similarity"), p.take(2000))
    }
    // brute force is UDF-free end to end now
    val bf = Similarity.annBruteForce(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!bf.contains("ScalaUDF"), bf.take(2000))
    // ...and so is IVF, including the query-side multi-probe
    val ivf = Similarity.annIvf(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!ivf.contains("ScalaUDF"), ivf.take(2000))
  }

  test("native multi-probe expression is bit-parity with the Scala " +
    "nearestCentroids on every corpus vector") {
    val emb = graft.queries.Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = Array(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f), Seq(0.5f, 0.5f, 0f, 0f), Seq(0f, 0f, 0f, 1f))
      .map(_.toArray)
    // pad/truncate corpus vectors to dim 4 via the first 4 dims
    val v4 = emb.select(col("vec_id"),
      expr("slice(embedding, 1, 4)").as("e"))
    val native = v4.select(col("vec_id"),
      Similarity.nearestCentroidsCol(col("e"), cents, 3).as("probe"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaScala = v4.collect().map { r =>
      r.getLong(0) ->
        Similarity.nearestCentroids(r.getSeq[Float](1), cents, 3)
    }.toMap
    assert(native.keySet == viaScala.keySet && native.nonEmpty)
    native.foreach { case (id, p) =>
      assert(p == viaScala(id), s"vec $id: $p vs ${viaScala(id)}") }
  }
}
