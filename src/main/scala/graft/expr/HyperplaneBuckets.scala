package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression assigning an embedding its LSH sign
  * buckets across `tables` hash tables of `planes` seeded gaussian
  * hyperplanes each — the corpus-wide hot loop of the bucketed ANN
  * path (s02). The Scala-UDF formulation pays per-row
  * ArrayData→Seq[Float] boxing plus a result converter; this
  * expression reads the unsafe float array in place, participates in
  * whole-stage codegen, and memoizes the (deterministically seeded)
  * plane matrix per operator instance — bit-identical buckets to
  * [[graft.queries.Similarity.signBucket]] over
  * [[graft.queries.Similarity.hyperplanes]].
  *
  * Element i of the result is `(i << 32) | signBucket(v, planes_i)`
  * where table i's planes derive from `java.util.Random(seed + i)` —
  * the table id rides in the high bits so a single `explode` yields
  * globally-distinct bucket keys. */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int,
                             dim: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_buckets"

  // the kernel reads elements via getFloat: reject anything else at
  // analysis time instead of misreading memory
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBuckets.kernel(input.asInstanceOf[ArrayData], tables, planes,
      dim, seed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val kernel = HyperplaneBuckets.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev,
      c => s"$kernel.kernel($c, $tables, $planes, $dim, ${seed}L)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBuckets = copy(child = newChild)
}

object HyperplaneBuckets {

  /** Column-level API. */
  def hyperplaneBuckets(c: Column, tables: Int, planes: Int, dim: Int,
                        seed: Long): Column =
    ColumnBridge.column(
      HyperplaneBuckets(ColumnBridge.expression(c), tables, planes, dim,
        seed))

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long),
      Array[Array[Array[Double]]]]()

  /** All tables' plane matrices for a seed config, built once per JVM
    * (executor-local; deterministic, so every executor builds the
    * identical matrix). Table i replays
    * Similarity.hyperplanes(planes, dim, seed + i) exactly. */
  private def planesFor(tables: Int, planes: Int, dim: Int,
                        seed: Long): Array[Array[Array[Double]]] =
    cache.computeIfAbsent((tables, planes, dim, seed), _ =>
      Array.tabulate(tables) { t =>
        val rnd = new java.util.Random(seed + t)
        Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
      })

  /** Static kernel invoked from interpreted eval and generated code. */
  def kernel(v: ArrayData, tables: Int, planes: Int, dim: Int,
             seed: Long): ArrayData = {
    val all = planesFor(tables, planes, dim, seed)
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val tp = all(t)
      var bucket = 0L
      var i = 0
      while (i < tp.length) {
        val p = tp(i)
        var dot = 0.0
        var j = 0
        val lim = math.min(p.length, n)
        while (j < lim) { dot += v.getFloat(j) * p(j); j += 1 }
        if (dot >= 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = (t.toLong << 32) | bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
