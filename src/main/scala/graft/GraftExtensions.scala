package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import graft.expr.{CosineSimilarity, DeflateLength, GkCount, GkEstimate, GkRank,
  GkMergeAgg, GkSketchAgg, HyperplaneBuckets, IntDotProduct, KmvSketchAgg,
  MinHashSignature, MisraGriesTopK, NgramHashes, SimHash64, TopKPairs}

/** SQL-surface registration for the engine's custom expressions.
  *
  * Cluster deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (applied at session construction). For an already-running session —
  * tests, notebooks — call [[GraftExtensions.register]] directly. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: native as-of join (planner strategy +
    // left-predicate pushdown rule)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofPushdown)
    // stats-driven join order + strategy from the stored ANALYZE
    // catalog (sk12) — in the pre-CBO slot: after operator
    // optimization (legs are in final shape), before Spark's own
    // join-reorder batch. Inert unless every leg is analyzed.
    ext.injectPreCBORule(_ => graft.plans.CboReorder)
    ext.injectFunction(GraftExtensions.minhashSignatureFn)
    ext.injectFunction(GraftExtensions.cosineSimilarityFn)
    ext.injectFunction(GraftExtensions.ngramHashesFn)
    ext.injectFunction(GraftExtensions.intDotFn)
    ext.injectFunction(GraftExtensions.hyperplaneBucketsFn)
    ext.injectFunction(GraftExtensions.simhash64Fn)
    ext.injectFunction(GraftExtensions.deflateLengthFn)
    ext.injectFunction(GraftExtensions.mgTopKFn)
    ext.injectFunction(GraftExtensions.topkPairsFn)
    ext.injectFunction(GraftExtensions.kmvSketchFn)
    ext.injectFunction(GraftExtensions.gkSketchFn)
    ext.injectFunction(GraftExtensions.gkMergeFn)
    ext.injectFunction(GraftExtensions.gkEstimateFn)
    ext.injectFunction(GraftExtensions.gkCountFn)
    ext.injectFunction(GraftExtensions.gkRankFn)
  }
}

object GraftExtensions {

  private def buildMinhash(exprs: Seq[Expression]): Expression = {
    val k = exprs.lift(1) match {
      case Some(Literal(v: Int, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"minhash_signature: k must be an integer literal, got $other")
      case None => 32
    }
    MinHashSignature(exprs.head, k)
  }

  private def buildCosine(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"cosine_similarity takes exactly 2 arguments, got ${exprs.size}")
    CosineSimilarity(exprs.head, exprs(1))
  }

  private[graft] val minhashSignatureFn = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinHashSignature].getName,
      "minhash_signature"),
    (exprs: Seq[Expression]) => buildMinhash(exprs))

  private def buildNgram(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, s"ngram_hashes takes (text, n), got ${exprs.size}")
    val n = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"ngram_hashes: n must be an integer literal, got $other")
    }
    NgramHashes(exprs.head, n)
  }

  private[graft] val ngramHashesFn = (
    FunctionIdentifier("ngram_hashes"),
    new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
    (exprs: Seq[Expression]) => buildNgram(exprs))

  private def buildIntDot(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"int_dot takes exactly 2 arguments, got ${exprs.size}")
    IntDotProduct(exprs.head, exprs(1))
  }

  private[graft] val intDotFn = (
    FunctionIdentifier("int_dot"),
    new ExpressionInfo(classOf[IntDotProduct].getName, "int_dot"),
    (exprs: Seq[Expression]) => buildIntDot(exprs))

  private def buildHyperplaneBuckets(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 5,
      s"hyperplane_buckets takes (vec, tables, planes, dim, seed), " +
        s"got ${exprs.size}")
    def intLit(i: Int): Int = exprs(i) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"hyperplane_buckets: argument $i must be an integer literal, " +
          s"got $other")
    }
    val seed = exprs(4) match {
      case Literal(v: Long, _) => v
      case Literal(v: Int, _) => v.toLong
      case other => throw new IllegalArgumentException(
        s"hyperplane_buckets: seed must be an integer literal, got $other")
    }
    HyperplaneBuckets(exprs.head, intLit(1), intLit(2), intLit(3), seed)
  }

  private[graft] val hyperplaneBucketsFn = (
    FunctionIdentifier("hyperplane_buckets"),
    new ExpressionInfo(classOf[HyperplaneBuckets].getName,
      "hyperplane_buckets"),
    (exprs: Seq[Expression]) => buildHyperplaneBuckets(exprs))

  private[graft] val cosineSimilarityFn = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName,
      "cosine_similarity"),
    (exprs: Seq[Expression]) => buildCosine(exprs))

  private def buildSimhash(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1,
      s"simhash64 takes exactly 1 argument, got ${exprs.size}")
    SimHash64(exprs.head)
  }

  private[graft] val simhash64Fn = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => buildSimhash(exprs))

  private def buildDeflateLength(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1,
      s"deflate_length takes exactly 1 argument, got ${exprs.size}")
    DeflateLength(exprs.head)
  }

  private[graft] val deflateLengthFn = (
    FunctionIdentifier("deflate_length"),
    new ExpressionInfo(classOf[DeflateLength].getName, "deflate_length"),
    (exprs: Seq[Expression]) => buildDeflateLength(exprs))

  // the analyzer wraps a bare AggregateFunction from a registry
  // builder in an AggregateExpression, same as builtin aggregates
  private def buildMgTopK(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"mg_topk takes (token, k), got ${exprs.size}")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"mg_topk: k must be an integer literal, got $other")
    }
    MisraGriesTopK(exprs.head, k)
  }

  private[graft] val mgTopKFn = (
    FunctionIdentifier("mg_topk"),
    new ExpressionInfo(classOf[MisraGriesTopK].getName, "mg_topk"),
    (exprs: Seq[Expression]) => buildMgTopK(exprs))

  private def buildTopkPairs(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 3,
      s"topk_pairs takes (score, tag, k), got ${exprs.size}")
    val k = exprs(2) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"topk_pairs: k must be an integer literal, got $other")
    }
    TopKPairs(exprs(0), exprs(1), k)
  }

  private[graft] val topkPairsFn = (
    FunctionIdentifier("topk_pairs"),
    new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
    (exprs: Seq[Expression]) => buildTopkPairs(exprs))

  private def buildKmvSketch(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"kmv_sketch takes (hash, k), got ${exprs.size}")
    val k = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"kmv_sketch: k must be an integer literal, got $other")
    }
    KmvSketchAgg(exprs.head, k)
  }

  private[graft] val kmvSketchFn = (
    FunctionIdentifier("kmv_sketch"),
    new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
    (exprs: Seq[Expression]) => buildKmvSketch(exprs))

  private def buildGkSketch(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"gk_sketch takes (value, accuracy), got ${exprs.size}")
    val acc = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"gk_sketch: accuracy must be an integer literal, got $other")
    }
    GkSketchAgg(exprs.head, acc)
  }

  private def buildGkMerge(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, s"gk_merge takes (state), got ${exprs.size}")
    GkMergeAgg(exprs.head)
  }

  private def buildGkEstimate(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"gk_estimate takes (state, q), got ${exprs.size}")
    // SQL parses `0.5` as DECIMAL(1,1); accept any numeric q the way
    // percentile_approx does, by casting at the registry boundary
    GkEstimate(exprs(0),
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
        org.apache.spark.sql.types.DoubleType))
  }

  private def buildGkCount(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1, s"gk_count takes (state), got ${exprs.size}")
    GkCount(exprs.head)
  }

  private def buildGkRank(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2,
      s"gk_rank takes (state, value), got ${exprs.size}")
    // accept any numeric value like gk_estimate does with q
    GkRank(exprs(0),
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
        org.apache.spark.sql.types.DoubleType))
  }

  private[graft] val gkSketchFn = (
    FunctionIdentifier("gk_sketch"),
    new ExpressionInfo(classOf[GkSketchAgg].getName, "gk_sketch"),
    (exprs: Seq[Expression]) => buildGkSketch(exprs))

  private[graft] val gkMergeFn = (
    FunctionIdentifier("gk_merge"),
    new ExpressionInfo(classOf[GkMergeAgg].getName, "gk_merge"),
    (exprs: Seq[Expression]) => buildGkMerge(exprs))

  private[graft] val gkEstimateFn = (
    FunctionIdentifier("gk_estimate"),
    new ExpressionInfo(classOf[GkEstimate].getName, "gk_estimate"),
    (exprs: Seq[Expression]) => buildGkEstimate(exprs))

  private[graft] val gkCountFn = (
    FunctionIdentifier("gk_count"),
    new ExpressionInfo(classOf[GkCount].getName, "gk_count"),
    (exprs: Seq[Expression]) => buildGkCount(exprs))

  private[graft] val gkRankFn = (
    FunctionIdentifier("gk_rank"),
    new ExpressionInfo(classOf[GkRank].getName, "gk_rank"),
    (exprs: Seq[Expression]) => buildGkRank(exprs))

  /** Register the engine's SQL functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", buildMinhash, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", buildCosine, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_hashes", buildNgram, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_dot", buildIntDot, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_buckets", buildHyperplaneBuckets, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", buildSimhash, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_length", buildDeflateLength, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_topk", buildMgTopK, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pairs", buildTopkPairs, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", buildKmvSketch, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gk_sketch", buildGkSketch, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gk_merge", buildGkMerge, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gk_estimate", buildGkEstimate, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gk_count", buildGkCount, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gk_rank", buildGkRank, "scala_udf")
  }
}
