package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * standard write-side organization for tables that are filtered on
  * more than one column (absent in the reference, which never persists
  * anything but flat CSV — `generator.py:147-161`; first-class in
  * Delta/Iceberg/Hudi `OPTIMIZE ZORDER BY`).
  *
  * A linear sort clusters min/max file statistics on ONE column; a
  * Z-order sort interleaves the bits of several columns so that every
  * contiguous z-range maps to a bounded hyper-rectangle — file-level
  * min/max pruning then works for predicates on ANY of the interleaved
  * dimensions. At 100 TB the win is entirely at scan time: a
  * two-dimensional predicate prunes ~sqrt of the files instead of
  * reading everything when the filter misses the single sort key.
  *
  * The z-value is pure bit arithmetic composed from builtin
  * shift/and/or functions — whole-stage codegen, no UDF, and exactly
  * replayable in any engine (the DuckDB oracle rebuilds it with the
  * same integer expression). The write path is one range shuffle
  * (`repartitionByRange` on the z-value + `sortWithinPartitions`),
  * identical in cost to the single-column sort it replaces. */
object Layout {

  /** Bits per dimension; 2 dims × 10 bits = 20-bit z-values. */
  private val ZBits = 10
  /** Top 6 bits of the z-value → 64 z-range buckets (one per file in
    * the write-path analogy). */
  private val ZBucketBits = 6

  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Composed
    * entirely from codegen'd builtins — the fold compiles to one
    * constant-folded expression tree inside WholeStageCodegen. */
  def zValue(x: Column, y: Column, bits: Int = ZBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as a DuckDB SQL expression (non-overlapping
    * bits, so `+` ≡ `|`). */
  private def zValueSql(x: String, y: String, bits: Int = ZBits): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** q22 — Z-order layout audit of lineitem on (l_partkey, l_orderkey):
    * assign every row its z-value, cut the z-range into [[ZBuckets]]
    * buckets (the per-file ranges a z-ordered write would produce), and
    * report each bucket's row count plus the bounding rectangle
    * [min,max]×[min,max] it spans in the original dimensions — the
    * exact statistics a scan planner prunes on. Bounded rectangles per
    * bucket ARE the layout property; the oracle checks them
    * bit-exactly.
    *
    * Scale shape: z-assignment is map-only expression work; the only
    * shuffle is the bucket aggregation (map-side partial over 64 keys).
    * The production write adds `repartitionByRange($"z")` — one range
    * shuffle, the same price as any sorted write. */
  def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val dims = Relational.table(s, dir, "lineitem").select(
      pmod(col("l_partkey").cast("long"), lit(1L << ZBits)).as("xd"),
      pmod(col("l_orderkey").cast("long"), lit(1L << ZBits)).as("yd"))
    val z = zValue(col("xd"), col("yd"))
    dims.withColumn("zbucket",
        shiftright(z, 2 * ZBits - ZBucketBits).cast("long"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("xd")).as("x_min"), max(col("xd")).as("x_max"),
        min(col("yd")).as("y_min"), max(col("yd")).as("y_max"))
      .orderBy("zbucket")
  }

  val zorderLayoutSql: String = {
    val z = zValueSql("xd", "yd")
    s"""
    WITH dims AS (
      SELECT l_partkey % ${1L << ZBits} AS xd,
             l_orderkey % ${1L << ZBits} AS yd
      FROM lineitem),
    zv AS (SELECT xd, yd, ($z) AS z FROM dims)
    SELECT z >> ${2 * ZBits - ZBucketBits} AS zbucket, count(*) AS n_rows,
      min(xd) AS x_min, max(xd) AS x_max,
      min(yd) AS y_min, max(yd) AS y_max
    FROM zv
    GROUP BY zbucket
    ORDER BY zbucket"""
  }

  private val Shards = 32

  /** q23 — range-sharded sorted output: the write-side global ordering
    * every sorted 100 TB table ships with. `repartitionByRange` samples
    * split points (one pass), then each shard sorts independently —
    * a global total order WITHOUT a single-reducer sort; shard files
    * carry non-overlapping min/max so readers binary-search the shard
    * list instead of scanning.
    *
    * The physical split points are sample-dependent (and may legally
    * merge empty shards), so the query outputs the INVARIANTS of the
    * layout, not the boundaries: total row count (nothing lost), shard
    * count within [1, Shards], and cross-shard non-overlap — each a
    * constant the oracle states in closed form. PlanSpec asserts the
    * plan shape (range exchange + non-global sort). */
  def rangeShards(s: SparkSession, dir: String): DataFrame = {
    val sharded = Relational.table(s, dir, "lineitem")
      .select(col("l_orderkey"))
      .repartitionByRange(Shards, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
    val stats = sharded
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("lo"), max(col("l_orderkey")).as("hi"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("lo", "pid")
    stats
      .withColumn("prev_hi", lag(col("hi"), 1).over(w))
      .agg(sum(col("n_rows")).as("n_rows"),
        (count(lit(1)) >= 1 && count(lit(1)) <= Shards).as("shards_ok"),
        coalesce(min(col("prev_hi") <= col("lo")), lit(true))
          .as("non_overlapping"))
  }

  val rangeShardsSql: String =
    "SELECT count(*) AS n_rows, TRUE AS shards_ok, " +
      "TRUE AS non_overlapping FROM lineitem"

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(("q22_zorder_layout", zorderLayout _, Some(zorderLayoutSql)),
      ("q23_range_shards", rangeShards _, Some(rangeShardsSql)))
}
