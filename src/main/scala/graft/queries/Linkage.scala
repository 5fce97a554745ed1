package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Record-linkage operators — the evaluation workload the reference's
  * synthetic data exists to serve (`/root/reference/README.md:1-4`,
  * `docs/index.md:3-11`: gecko generates corrupted records for
  * record-linkage evaluation; the library itself stops at data
  * generation). An engine that generates corrupted copies at 100 TB
  * should also be able to LINK them back at 100 TB, so the matcher is
  * a first-class operator here (absent in reference — Layer B).
  *
  * Core operator: the blocked similarity join. The naive formulation
  * is an O(n²) cross join with an edit-distance predicate — a
  * cartesian product Catalyst cannot save. The scale-safe formulation
  * is the classic blocking decomposition: an EQUI-join on a cheap
  * deterministic block key (so Catalyst plans a hash/sort-merge join,
  * never a cartesian) and the expensive levenshtein verify runs on
  * in-block candidates only. The block key is the scaling knob: a
  * k-char prefix yields ≤|alphabet|^k blocks, so per-block candidate
  * counts — and the quadratic term — are bounded by corpus/blocks;
  * at larger corpora pass a longer prefix or a composite key
  * (prefix + length band, domain, phonetic code).
  */
object Linkage {

  /** Blocked fuzzy join: candidate pairs of (left, right) rows whose
    * `blockOf(name)` keys are equal and whose names are within
    * `maxDist` edits. `left` and `right` must not share column names.
    *
    * Plan shape (PlanSpec-asserted): one equi-join on the block key —
    * shuffle hash / sort-merge at scale, broadcast when one side is
    * tiny — with levenshtein applied as a post-join filter on
    * candidates only. No CartesianProduct anywhere. */
  def blockedLevenshteinJoin(left: DataFrame, leftName: String,
                             right: DataFrame, rightName: String,
                             blockOf: Column => Column,
                             maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, is $maxDist")
    val l = left.withColumn("__block", blockOf(col(leftName)))
    val r = right.withColumn("__block", blockOf(col(rightName)))
    l.join(r, Seq("__block"))
      .filter(levenshtein(col(leftName), col(rightName)) <= maxDist)
      .drop("__block")
  }

  // --------------------------------------------------- demo corpus
  // A deterministic identity corpus: reverse the 9 zero-padded digits
  // of c_name (so the varying low digits land in the blocking prefix,
  // not a constant '000…' run) and map digits to letters. Unique per
  // customer, pure SQL in both engines — which is what buys the demo
  // queries an EXACT DuckDB oracle instead of a rows-only check.

  private val DigitLetters = "aeioubcdfg"

  private def identities(s: SparkSession, dir: String): DataFrame =
    Relational.table(s, dir, "customer")
      .select(col("c_custkey").as("cust_id"),
        translate(reverse(substring(col("c_name"), 10, 9)),
          "0123456789", DigitLetters).as("name"))

  /** The corrupted copy: delete one character at position
    * 4 + (key mod 5) — a with_delete-style single-edit corruption
    * (reference semantics: gecko/mutator.py:762-812) made
    * deterministic so the oracle can replay it. Positions ≥ 4 keep
    * the 3-char blocking prefix intact, mirroring how real linkage
    * pipelines pick block keys from stable name regions. */
  private def corrupted(s: SparkSession, dir: String): DataFrame = {
    val pos = (col("cust_id") % 5 + lit(4)).cast("int")
    identities(s, dir).select(
      col("cust_id").as("rec_id"),
      concat(col("name").substr(lit(1), pos - 1),
        col("name").substr(pos + 1, lit(9))).as("rec_name"))
  }

  private val identitiesSql = """
    SELECT c_custkey AS cust_id,
           translate(reverse(substr(c_name, 10, 9)),
                     '0123456789', 'aeioubcdfg') AS name
    FROM customer"""

  private val corruptedSql = """
    SELECT cust_id AS rec_id,
           substr(name, 1, CAST(3 + cust_id % 5 AS INT)) ||
           substr(name, CAST(5 + cust_id % 5 AS INT)) AS rec_name
    FROM ids"""

  // ------------------------------------------------------ l01 pairs

  /** l01: all candidate pairs within 1 edit, 3-char-prefix blocking.
    * Every corrupted record's true source shares its block (the edit
    * never touches the prefix) at distance exactly 1; additional
    * pairs are genuine near-collisions of the identity space — both
    * engines must agree on the full pair set, hash-exactly. */
  def linkagePairs(s: SparkSession, dir: String): DataFrame =
    pairs(s, dir).orderBy("cust_id", "rec_id")

  private def pairs(s: SparkSession, dir: String): DataFrame =
    blockedLevenshteinJoin(identities(s, dir), "name",
        corrupted(s, dir), "rec_name",
        n => substring(n, 1, 3), maxDist = 1)
      .select(col("cust_id"), col("rec_id"),
        levenshtein(col("name"), col("rec_name")).cast("long").as("dist"))

  val linkagePairsSql: String = s"""
    WITH ids AS ($identitiesSql),
    corr AS ($corruptedSql)
    SELECT i.cust_id, c.rec_id,
           CAST(levenshtein(i.name, c.rec_name) AS BIGINT) AS dist
    FROM ids i JOIN corr c
      ON substr(i.name, 1, 3) = substr(c.rec_name, 1, 3)
    WHERE levenshtein(i.name, c.rec_name) <= 1
    ORDER BY cust_id, rec_id"""

  // ---------------------------------------------------- l02 quality

  /** l02: linkage quality vs ground truth (a pair is correct iff it
    * links a corrupted record to its own source). Precision/recall as
    * exact integer millis — rational arithmetic, not floating log —
    * so the oracle matches bit-for-bit (t11's trick). One aggregate
    * over the candidate pairs + one count of the truth set. */
  def linkageQuality(s: SparkSession, dir: String): DataFrame = {
    val truth = identities(s, dir).agg(count(lit(1)).as("n_truth"))
    pairs(s, dir)
      .agg(count(lit(1)).as("n_pred"),
        sum(when(col("cust_id") === col("rec_id"), 1L).otherwise(0L))
          .as("n_correct"))
      .crossJoin(truth)
      .select(col("n_truth"), col("n_pred"), col("n_correct"),
        expr("n_correct * 1000 div n_pred").as("precision_milli"),
        expr("n_correct * 1000 div n_truth").as("recall_milli"))
  }

  val linkageQualitySql: String = s"""
    WITH ids AS ($identitiesSql),
    corr AS ($corruptedSql),
    p AS (
      SELECT count(*) AS n_pred,
             CAST(sum(CASE WHEN i.cust_id = c.rec_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM ids i JOIN corr c
        ON substr(i.name, 1, 3) = substr(c.rec_name, 1, 3)
      WHERE levenshtein(i.name, c.rec_name) <= 1),
    t AS (SELECT count(*) AS n_truth FROM ids)
    SELECT n_truth, n_pred, n_correct,
           n_correct * 1000 // n_pred AS precision_milli,
           n_correct * 1000 // n_truth AS recall_milli
    FROM p, t"""

  // ---------------------------------------- l03 sorted neighborhood
  private val SnWindow = 3

  /** l03 — sorted-neighborhood blocking, the classic complement to
    * l01's prefix blocking (Hernández & Stolfo's merge/purge): sort
    * BOTH sides on the match key and compare each record only to its
    * [[SnWindow]] successors in the global sort order. Where prefix
    * blocking bounds candidates by block size, SNM bounds them by a
    * CONSTANT per record — robust when key distributions make some
    * blocks huge.
    *
    * Scale shape: the global sort RANK uses s09's two-phase trick
    * (bucket by first key char — lexicographic bucket order is a
    * prefix of the key order — tiny count/offset agg, rank within
    * buckets), so no single window partition sees the corpus. The
    * neighborhood itself is an EQUI-join: each record explodes into
    * [[SnWindow]] (rank+k) probes joined on rank — never a theta
    * join, fanout bounded by the window. The expensive levenshtein
    * runs on the W·n candidates only. */
  def sortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = identities(s, dir)
        .select(col("cust_id").as("id"), col("name").as("key"),
          lit("i").as("side"))
      .unionAll(corrupted(s, dir)
        .select(col("rec_id").as("id"), col("rec_name").as("key"),
          lit("c").as("side")))
      .withColumn("bucket", substring(col("key"), 1, 1))
    val counts = u.groupBy("bucket").agg(count(lit(1)).as("n"))
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("offset",
        coalesce(sum(col("n")).over(wOff), lit(0L)))
      .select("bucket", "offset")
    val wIn = Window.partitionBy("bucket").orderBy("key", "side", "id")
    // consumed twice (probe + build) — truncate lineage once
    val ranked = u.join(broadcast(offsets), "bucket")
      .withColumn("r",
        (col("offset") + row_number().over(wIn) - 1).cast("long"))
      .select("id", "key", "side", "r")
      .localCheckpoint()
    val probe = ranked
      .select(col("id").as("a_id"), col("key").as("a_key"),
        col("side").as("a_side"),
        explode(array((1 to SnWindow).map(lit(_)): _*)).as("k"),
        col("r").as("a_r"))
      .withColumn("r", col("a_r") + col("k"))
    probe
      .join(ranked
        .withColumnRenamed("id", "b_id")
        .withColumnRenamed("key", "b_key")
        .withColumnRenamed("side", "b_side"), "r")
      .filter((col("a_side") === "i" && col("b_side") === "c") ||
        (col("a_side") === "c" && col("b_side") === "i"))
      .filter(levenshtein(col("a_key"), col("b_key")) <= 1)
      .select(
        when(col("a_side") === "i", col("a_id")).otherwise(col("b_id"))
          .as("cust_id"),
        when(col("a_side") === "i", col("b_id")).otherwise(col("a_id"))
          .as("rec_id"),
        levenshtein(col("a_key"), col("b_key")).cast("long").as("dist"),
        col("k").cast("long").as("rank_gap"))
      .orderBy("cust_id", "rec_id")
  }

  val sortedNeighborhoodSql: String = s"""
    WITH ids AS ($identitiesSql),
    corr AS ($corruptedSql),
    u AS (
      SELECT cust_id AS id, name AS key, 'i' AS side FROM ids
      UNION ALL
      SELECT rec_id, rec_name, 'c' FROM corr),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY key, side, id) - 1 AS r
      FROM u),
    cand AS (
      SELECT a.id AS a_id, a.key AS a_key, a.side AS a_side,
             b.id AS b_id, b.key AS b_key, b.side AS b_side,
             b.r - a.r AS rank_gap
      FROM ranked a JOIN ranked b
        ON b.r >= a.r + 1 AND b.r <= a.r + $SnWindow)
    SELECT CASE WHEN a_side = 'i' THEN a_id ELSE b_id END AS cust_id,
           CASE WHEN a_side = 'i' THEN b_id ELSE a_id END AS rec_id,
           CAST(levenshtein(a_key, b_key) AS BIGINT) AS dist,
           CAST(rank_gap AS BIGINT) AS rank_gap
    FROM cand
    WHERE ((a_side = 'i' AND b_side = 'c')
        OR (a_side = 'c' AND b_side = 'i'))
      AND levenshtein(a_key, b_key) <= 1
    ORDER BY cust_id, rec_id"""

  // ------------------------------------------- l04 Fellegi-Sunter
  // Milli-scaled log2(m/u) agreement weights (fixed, published-style
  // parameters — FS weights are model constants at scoring time, so
  // the score is exact integer arithmetic both engines replay).
  private val WNameExact = 2800 // log2(m≈.95/u≈.14)·1000-ish
  private val WNameClose = 1500 // 1-edit within the block: weaker
  private val WNationAgree = 3300
  private val WNationDis = -1100
  private val WSegAgree = 700 // 5 segments: weak evidence
  private val WSegDis = -1500
  private val MatchAt = 5000
  private val ReviewAt = 2000

  /** The l04 record sides: l01's name corruption plus two more
    * compared fields, each corrupted on a deterministic key slice —
    * nation key bumped to the next code for every 3rd record, market
    * segment blanked for every 7th (gecko's categorical/missing-value
    * mutator semantics, made replayable). */
  private def l04Identities(s: SparkSession, dir: String): DataFrame =
    Relational.table(s, dir, "customer")
      .select(col("c_custkey").as("cust_id"),
        translate(reverse(substring(col("c_name"), 10, 9)),
          "0123456789", DigitLetters).as("name"),
        col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"))

  private def l04Corrupted(s: SparkSession, dir: String): DataFrame = {
    val pos = (col("cust_id") % 5 + lit(4)).cast("int")
    l04Identities(s, dir).select(
      col("cust_id").as("rec_id"),
      concat(col("name").substr(lit(1), pos - 1),
        col("name").substr(pos + 1, lit(9))).as("rec_name"),
      when(col("cust_id") % 3 === 0, (col("nation") + 1) % 25)
        .otherwise(col("nation")).as("rec_nation"),
      when(col("cust_id") % 7 === 0, lit("UNKNOWN"))
        .otherwise(col("segment")).as("rec_segment"))
  }

  /** l04 — Fellegi-Sunter match scoring over the blocked candidates:
    * each (field, agreement level) contributes its fixed log-odds
    * weight, the milli-scaled integer sum classifies the pair as
    * match / review / non_match. This is the decision layer of the
    * classic linkage stack (blocking l01/l03 → comparison → FS
    * decision); weights are constants, so at 100 TB it adds ZERO
    * shuffles to the blocking join — pure codegen'd case arithmetic
    * on candidates. */
  def fellegiSunter(s: SparkSession, dir: String): DataFrame =
    fellegiSunterOn(s, dir, n => substring(n, 1, 3))

  /** The FS decision layer on a caller-chosen blocking key (l08 runs
    * it on the composite key; the default 3-char prefix is l04). */
  private def fellegiSunterOn(s: SparkSession, dir: String,
      blockOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val cand = blockedLevenshteinJoin(l04Identities(s, dir), "name",
      l04Corrupted(s, dir), "rec_name",
      blockOf, maxDist = 1)
    val score =
      when(levenshtein(col("name"), col("rec_name")) === 0,
        lit(WNameExact)).otherwise(lit(WNameClose)) +
      when(col("nation") === col("rec_nation"), lit(WNationAgree))
        .otherwise(lit(WNationDis)) +
      when(col("segment") === col("rec_segment"), lit(WSegAgree))
        .otherwise(lit(WSegDis))
    cand
      .withColumn("score_milli", score.cast("long"))
      .select(col("cust_id"), col("rec_id"), col("score_milli"),
        when(col("score_milli") >= MatchAt, lit("match"))
          .when(col("score_milli") >= ReviewAt, lit("review"))
          .otherwise(lit("non_match")).as("decision"))
      .orderBy("cust_id", "rec_id")
  }

  private val l04IdentitiesSql = """
    SELECT c_custkey AS cust_id,
           translate(reverse(substr(c_name, 10, 9)),
                     '0123456789', 'aeioubcdfg') AS name,
           c_nationkey AS nation,
           c_mktsegment AS segment
    FROM customer"""

  private val l04CorruptedSql = """
    SELECT cust_id AS rec_id,
           substr(name, 1, CAST(3 + cust_id % 5 AS INT)) ||
           substr(name, CAST(5 + cust_id % 5 AS INT)) AS rec_name,
           CASE WHEN cust_id % 3 = 0 THEN (nation + 1) % 25
                ELSE nation END AS rec_nation,
           CASE WHEN cust_id % 7 = 0 THEN 'UNKNOWN'
                ELSE segment END AS rec_segment
    FROM ids"""

  private def fellegiSunterSqlOn(blockCond: String): String = s"""
    WITH ids AS ($l04IdentitiesSql),
    corr AS ($l04CorruptedSql),
    scored AS (
      SELECT i.cust_id, c.rec_id,
        CAST(CASE WHEN levenshtein(i.name, c.rec_name) = 0
                  THEN $WNameExact ELSE $WNameClose END
           + CASE WHEN i.nation = c.rec_nation
                  THEN $WNationAgree ELSE $WNationDis END
           + CASE WHEN i.segment = c.rec_segment
                  THEN $WSegAgree ELSE $WSegDis END AS BIGINT)
          AS score_milli
      FROM ids i JOIN corr c
        ON $blockCond
      WHERE levenshtein(i.name, c.rec_name) <= 1)
    SELECT cust_id, rec_id, score_milli,
      CASE WHEN score_milli >= $MatchAt THEN 'match'
           WHEN score_milli >= $ReviewAt THEN 'review'
           ELSE 'non_match' END AS decision
    FROM scored
    ORDER BY cust_id, rec_id"""

  /** The 3-char-prefix default (l04). */
  private val PrefixBlockCond =
    "substr(i.name, 1, 3) = substr(c.rec_name, 1, 3)"

  val fellegiSunterSql: String = fellegiSunterSqlOn(PrefixBlockCond)

  /** Right-side node ids live above left-side ones. NOT a multiple of
    * (or congruent to 0 mod) [[graft.tools.ScaleUpTestData]]'s key
    * Stride (1e7): when scaled dirs shift keys by `copy * Stride`,
    * copy i's record node ids (`key + i*Stride + RecOffset`) must not
    * land on copy i+1's identity node ids (`key + (i+1)*Stride`).
    * With RecOffset = 5e6 and base keys ≤ ~150k, identity ids occupy
    * `[i*1e7, i*1e7 + 150k]` and record ids `[i*1e7 + 5e6, i*1e7 +
    * 5e6 + 150k]` — disjoint bands for every copy. (The r9 value 1e7
    * was exactly Stride, chaining every customer's copies into one
    * cluster with duplicate node ids in scaled-dir l05/l08 runs.)
    * Bound for NATIVELY generated (unscaled) dirs: record ids stay
    * disjoint from identity ids while max(c_custkey) < 5e6 — native
    * TPC-H crosses that around sf≈33 (150k keys/sf); past it, raise
    * RecOffset to the next Stride-coprime band above the key range. */
  private[graft] val RecOffset = 5000000L

  // ------------------------------------- l05 entity resolution
  /** The DEFAULT blocking key: 3-char prefix PLUS final character,
    * both read from the name regions the corruption model provably
    * leaves intact (the single deletion lands at positions 4–8 of 9).
    * Composite by default because it is the key that SCALES: the key
    * domain is ×|alphabet| larger than the bare prefix, so per-block
    * candidate volume — the quadratic term — is ~10× smaller at the
    * same recall (no true pair can disagree on the stable regions).
    * Measured: 2× end-to-end at sf1 vs the 3-char prefix
    * (BASELINE.md); l08 keeps the bare-prefix variant as the
    * pedagogical contrast row. */
  private val CompositeKey: Column => Column =
    n => concat(substring(n, 1, 3), substring(n, -1, 1))

  private val CompositeBlockCond: String =
    "substr(i.name, 1, 3) || substr(i.name, -1, 1) = " +
      "substr(c.rec_name, 1, 3) || substr(c.rec_name, -1, 1)"

  /** l05 — the COMPOSED entity-resolution pipeline, end to end in one
    * declarative plan: blocking (the [[CompositeKey]] equi-join —
    * the scale-safe default; see l08 for the bare-prefix contrast) →
    * field comparison → Fellegi-Sunter decision (l04) → 'match' edges
    * → min-label clustering → golden record per entity. This is the
    * "a linkage user could switch" showcase, the c01 pattern applied
    * to the linkage stack: every stage changes the surviving set, so
    * one hash match proves the composition.
    *
    * Clustering runs exactly TWO min-label rounds. The match graph is
    * stars around each identity (a corrupted record matches its
    * original; blocking keeps spurious cross-matches rare), so label
    * propagation converges in ≤2 hops — and because the oracle replays
    * the SAME two rounds, parity holds by construction even where it
    * hasn't; Round5eSpec asserts observed convergence (round 2 ==
    * round 3) on the real corpus, the d07-style closed-form guard.
    *
    * Scale shape: the only non-blocking-join work is two edge⋈label
    * joins + label aggregations (the d06/gr01 superstep shape, here
    * with a CONSTANT round count); golden-record election is one
    * struct-min per cluster (arg-min by node id), map-side combinable. */
  def entityResolution(s: SparkSession, dir: String): DataFrame =
    entityResolutionOn(s, dir, CompositeKey)

  /** The FS decisions under the DEFAULT (composite) blocking — the
    * exact edge set [[entityResolution]] consumes; spec hook for the
    * closure/convergence assertions. */
  private[graft] def defaultMatchDecisions(s: SparkSession,
      dir: String): DataFrame = fellegiSunterOn(s, dir, CompositeKey)

  private def entityResolutionOn(s: SparkSession, dir: String,
      blockOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val m = fellegiSunterOn(s, dir, blockOf)
      .filter(col("decision") === "match")
      .select(col("cust_id").as("u"),
        (col("rec_id") + RecOffset).as("v"))
    val nodes = l04Identities(s, dir)
      .select(col("cust_id").as("node"), col("name"))
      .unionAll(l04Corrupted(s, dir)
        .select((col("rec_id") + RecOffset).as("node"),
          col("rec_name").as("name")))
      .persist()
    val edges = m.unionAll(m.select(col("v").as("u"), col("u").as("v")))
      .persist()
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to 2) {
      val nbrMin = edges.join(labels, col("v") === col("node"))
        .groupBy("u").agg(min(col("label")).as("nl"))
      labels = labels
        .join(nbrMin, labels("node") === nbrMin("u"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label")))
            .as("label"))
    }
    val out = labels.join(nodes, "node")
      .groupBy(col("label").as("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        min(struct(col("node"), col("name"))).as("m"))
      .select(col("entity_id"), col("n_records"),
        col("m").getField("name").as("golden_name"))
      .orderBy("entity_id")
    CacheScope.materializeAndRelease(out, nodes, edges)
  }

  private def entityResolutionSqlOn(blockCond: String): String = {
    def round(prev: String, out: String): String = s"""
    $out AS (
      SELECT n.node, least(n.label, coalesce(m.nl, n.label)) AS label
      FROM $prev n LEFT JOIN (
        SELECT e.u, min(l.label) AS nl
        FROM edges e JOIN $prev l ON e.v = l.node
        GROUP BY e.u) m ON n.node = m.u)"""
    s"""
    WITH matches AS (
      SELECT cust_id AS u, rec_id + $RecOffset AS v
      FROM (${fellegiSunterSqlOn(blockCond)})
      WHERE decision = 'match'),
    ids AS ($l04IdentitiesSql),
    corr AS ($l04CorruptedSql),
    nodes AS (
      SELECT cust_id AS node, name FROM ids
      UNION ALL
      SELECT rec_id + $RecOffset AS node, rec_name AS name FROM corr),
    edges AS (
      SELECT u, v FROM matches UNION ALL SELECT v AS u, u AS v
      FROM matches),
    l0 AS (SELECT node, node AS label FROM nodes),
    ${round("l0", "l1")},
    ${round("l1", "l2")}
    SELECT l.label AS entity_id, count(*) AS n_records,
      arg_min(n.name, n.node) AS golden_name
    FROM l2 l JOIN nodes n ON l.node = n.node
    GROUP BY 1
    ORDER BY entity_id"""
  }

  val entityResolutionSql: String =
    entityResolutionSqlOn(CompositeBlockCond)

  // ----------------------- l08 bare-prefix blocking (contrast row)
  /** l08 — l05's full pipeline on the BARE 3-char-prefix key: the
    * pedagogical contrast to the composite default (it was the
    * default until r9). Same recall on the corruption model (the
    * deletion never touches the prefix), but the key domain is
    * ×|alphabet| smaller, so per-block candidate volume — and the
    * quadratic verify term — grows with the corpus ~10× faster than
    * the composite key's: the measured l05-vs-l08 gap in BASELINE.md
    * IS the blocking-key scaling lesson (the l01 scaladoc's "a longer
    * prefix or a composite key" made concrete). On the current draw
    * the match-edge set (and therefore the golden-record output) is
    * IDENTICAL to l05's, pinned by Round8Spec; the oracle replays
    * l08's own blocking, so the row would stay green even on a draw
    * where a spurious cross-identity candidate appears only in the
    * looser blocks.
    *
    * substring(n, -1, 1) in the composite key is last-char in BOTH
    * engines (negative start), which is what lets one key expression
    * serve the 9-char identity and the 8-char corrupted side. */
  def prefixBlockResolution(s: SparkSession, dir: String): DataFrame =
    entityResolutionOn(s, dir, n => substring(n, 1, 3))

  val prefixBlockResolutionSql: String =
    entityResolutionSqlOn(PrefixBlockCond)

  // ------------------------------------ l06 edit-distance linkage
  /** l06 — bounded edit-distance fuzzy matching, the classic
    * approximate-string verify of the linkage stack (l01/l03 BLOCK,
    * l04 SCORES agreement patterns — this is the primitive that
    * decides whether two strings agree approximately in the first
    * place). Every part name spawns a dirty probe with ONE planted
    * edit — substitution / deletion / insertion by p_partkey mod 3,
    * at a deterministic position ≥ 2 so the first character (the
    * block key) survives — and probes match catalog names within
    * Levenshtein distance 1 inside their block. Each probe must
    * recover its own origin (the plant is ≤ 1 edit by construction);
    * additional distance-1 neighbors ('red bolt' ~ 'red bolts') are
    * legitimate matches both engines must agree on exactly.
    *
    * Scale shape: the verify runs only on BLOCKED candidate pairs
    * (never all-pairs), and Spark's three-arg `levenshtein` carries
    * the threshold INTO the DP kernel — rows whose distance exceeds 1
    * abandon the O(L²) table early, the banded-DP trick every
    * large-scale fuzzy joiner uses. Blocks here are first-character
    * (26-way, demo-sized); in production the same verify rides l01's
    * prefix blocks or l03's sorted neighborhood. */
  def editDistanceLinkage(s: SparkSession, dir: String): DataFrame = {
    val parts = Relational.table(s, dir, "part")
      .select(col("p_partkey"), col("p_name"))
    val pos = (lit(2) + col("p_partkey") % (length(col("p_name")) - 1))
      .cast("int")
    val head = col("p_name").substr(lit(1), pos - 1)
    val tailFrom = col("p_name").substr(pos + 1, lit(1000))
    val tailAt = col("p_name").substr(pos, lit(1000))
    val dirty = when(col("p_partkey") % 3 === 0,
      concat(head, lit("#"), tailFrom))                 // substitute
      .when(col("p_partkey") % 3 === 1, concat(head, tailFrom)) // delete
      .otherwise(concat(head, lit("#"), tailAt))        // insert
    val probes = parts
      .select(col("p_partkey").as("probe_id"), dirty.as("dirty_name"))
    val catalog = parts.select(col("p_name")).distinct()
      .select(col("p_name").as("clean_name"))
    probes.join(broadcast(catalog),
        substring(col("dirty_name"), 1, 1) ===
          substring(col("clean_name"), 1, 1))
      .withColumn("dist",
        levenshtein(col("dirty_name"), col("clean_name"), 1))
      .filter(col("dist") >= 0 && col("dist") <= 1)
      .select(col("probe_id"), col("dirty_name"), col("clean_name"),
        col("dist").cast("long").as("dist"))
      .orderBy("probe_id", "clean_name")
  }

  val editDistanceLinkageSql: String = """
    WITH parts AS (
      SELECT p_partkey, p_name,
        CAST(2 + p_partkey % (len(p_name) - 1) AS INT) AS pos
      FROM part),
    probes AS (
      SELECT p_partkey AS probe_id,
        CASE p_partkey % 3
          WHEN 0 THEN substr(p_name, 1, pos - 1) || '#'
            || substr(p_name, pos + 1)
          WHEN 1 THEN substr(p_name, 1, pos - 1)
            || substr(p_name, pos + 1)
          ELSE substr(p_name, 1, pos - 1) || '#'
            || substr(p_name, pos)
        END AS dirty_name
      FROM parts),
    catalog AS (SELECT DISTINCT p_name AS clean_name FROM part)
    SELECT probe_id, dirty_name, clean_name,
      CAST(levenshtein(dirty_name, clean_name) AS BIGINT) AS dist
    FROM probes JOIN catalog
      ON substr(dirty_name, 1, 1) = substr(clean_name, 1, 1)
    WHERE levenshtein(dirty_name, clean_name) <= 1
    ORDER BY probe_id, clean_name"""

  // ----------------------------------- l07 blocking-quality audit
  /** l07 — blocking-quality audit: the two numbers every blocking
    * scheme is judged by — REDUCTION RATIO (what fraction of the
    * all-pairs space the blocks prune) and PAIR COMPLETENESS (what
    * fraction of TRUE matches survive blocking) — measured for two
    * competing blockers over l06's planted-typo corpus. First-char
    * blocking keeps every true pair (l06's plants never touch
    * position 1) at a modest reduction; LENGTH blocking prunes
    * harder but loses exactly the deletion and insertion classes
    * (they change the length, so the true pair crosses blocks) —
    * the audit that SHOWS why blocker choice is a recall decision,
    * st19's measure-then-choose discipline on the linkage stack.
    * Ground truth: probe i's true match is its own origin name.
    *
    * Scale shape: candidate counts come from per-block size products
    * (one tiny agg per blocker — |probes_b|·|catalog_b| summed, no
    * pair materialization at all); completeness joins the true-pair
    * list (corpus-sized, not quadratic) against block keys. */
  def blockingAudit(s: SparkSession, dir: String): DataFrame = {
    val parts = Relational.table(s, dir, "part")
      .select(col("p_partkey"), col("p_name"))
    val pos = (lit(2) + col("p_partkey") % (length(col("p_name")) - 1))
      .cast("int")
    val head = col("p_name").substr(lit(1), pos - 1)
    val tailFrom = col("p_name").substr(pos + 1, lit(1000))
    val tailAt = col("p_name").substr(pos, lit(1000))
    val dirty = when(col("p_partkey") % 3 === 0,
      concat(head, lit("#"), tailFrom))
      .when(col("p_partkey") % 3 === 1, concat(head, tailFrom))
      .otherwise(concat(head, lit("#"), tailAt))
    val probes = parts
      .select(col("p_partkey").as("probe_id"), col("p_name").as("origin"),
        dirty.as("dirty_name")).persist()
    val catalog = parts.select(col("p_name").as("clean_name")).distinct()
      .persist()
    // blocker key expressions over an arbitrary name column
    def firstChar(c: org.apache.spark.sql.Column) = substring(c, 1, 1)
    def lenKey(c: org.apache.spark.sql.Column) = length(c)
    def auditRow(blocker: String,
                 key: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
        : DataFrame = {
      val pb = probes.groupBy(key(col("dirty_name")).as("blk"))
        .agg(count(lit(1)).as("np"))
      val cb = catalog.groupBy(key(col("clean_name")).as("blk"))
        .agg(count(lit(1)).as("nc"))
      val candidates = pb.join(cb, "blk")
        .agg(coalesce(sum(col("np") * col("nc")), lit(0L))
          .as("candidates"))
      val kept = probes
        .filter(key(col("dirty_name")) === key(col("origin")))
        .agg(count(lit(1)).as("found_pairs"))
      probes.agg(count(lit(1)).as("true_pairs"))
        .crossJoin(catalog.agg(count(lit(1)).as("n_catalog")))
        .crossJoin(candidates)
        .crossJoin(kept)
        .select(lit(blocker).as("blocker"),
          col("candidates"),
          expr("1000000 - candidates * 1000000 div " +
            "(true_pairs * n_catalog)").as("reduction_ppm"),
          col("true_pairs"), col("found_pairs"),
          expr("found_pairs * 1000000 div true_pairs")
            .as("completeness_ppm"))
    }
    val out = auditRow("first_char", firstChar)
      .unionAll(auditRow("length", lenKey))
      .orderBy("blocker")
    CacheScope.materializeAndRelease(out, probes, catalog)
  }

  val blockingAuditSql: String = """
    WITH parts AS (
      SELECT p_partkey, p_name,
        CAST(2 + p_partkey % (len(p_name) - 1) AS INT) AS pos
      FROM part),
    probes AS (
      SELECT p_partkey AS probe_id, p_name AS origin,
        CASE p_partkey % 3
          WHEN 0 THEN substr(p_name, 1, pos - 1) || '#'
            || substr(p_name, pos + 1)
          WHEN 1 THEN substr(p_name, 1, pos - 1)
            || substr(p_name, pos + 1)
          ELSE substr(p_name, 1, pos - 1) || '#'
            || substr(p_name, pos)
        END AS dirty_name
      FROM parts),
    catalog AS (SELECT DISTINCT p_name AS clean_name FROM part),
    audits AS (
      SELECT 'first_char' AS blocker,
        (SELECT CAST(COALESCE(sum(np * nc), 0) AS BIGINT) FROM
          (SELECT substr(dirty_name, 1, 1) AS blk, count(*) AS np
           FROM probes GROUP BY 1) p
          JOIN
          (SELECT substr(clean_name, 1, 1) AS blk, count(*) AS nc
           FROM catalog GROUP BY 1) c USING (blk)) AS candidates,
        (SELECT count(*) FROM probes
         WHERE substr(dirty_name, 1, 1) = substr(origin, 1, 1))
          AS found_pairs
      UNION ALL
      SELECT 'length' AS blocker,
        (SELECT CAST(COALESCE(sum(np * nc), 0) AS BIGINT) FROM
          (SELECT len(dirty_name) AS blk, count(*) AS np
           FROM probes GROUP BY 1) p
          JOIN
          (SELECT len(clean_name) AS blk, count(*) AS nc
           FROM catalog GROUP BY 1) c USING (blk)) AS candidates,
        (SELECT count(*) FROM probes
         WHERE len(dirty_name) = len(origin)) AS found_pairs)
    SELECT a.blocker, a.candidates,
      CAST(1000000 - a.candidates * 1000000 //
        ((SELECT count(*) FROM probes) *
         (SELECT count(*) FROM catalog)) AS BIGINT) AS reduction_ppm,
      (SELECT count(*) FROM probes) AS true_pairs,
      a.found_pairs,
      CAST(a.found_pairs * 1000000 //
        (SELECT count(*) FROM probes) AS BIGINT) AS completeness_ppm
    FROM audits a
    ORDER BY blocker"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("l01_linkage_pairs", linkagePairs _, Some(linkagePairsSql)),
      ("l02_linkage_quality", linkageQuality _, Some(linkageQualitySql)),
      ("l03_sorted_neighborhood", sortedNeighborhood _,
        Some(sortedNeighborhoodSql)),
      ("l04_fellegi_sunter", fellegiSunter _, Some(fellegiSunterSql)),
      ("l05_entity_resolution", entityResolution _,
        Some(entityResolutionSql)),
      ("l06_edit_distance", editDistanceLinkage _,
        Some(editDistanceLinkageSql)),
      ("l07_blocking_audit", blockingAudit _, Some(blockingAuditSql)),
      ("l08_prefix_blocking", prefixBlockResolution _,
        Some(prefixBlockResolutionSql)),
    )
}
