package graft

import org.apache.spark.sql.functions._

/** Round-13 continuation session: the post-review hardening (crash-
  * safe BM25 totals — pinned in Round13Spec) and the new operators
  * (st35 streamed BM25 ingest, c16 retraction-aware MV, q45 time
  * travel).
  */
class Round13bSpec extends SparkSpec {

  // ------------------- c16 retraction-aware MV: group-pruned recompute
  test("c16: only the group whose stored extremum was retracted takes " +
    "the rescan path; everything else folds additively") {
    val audited = queries.Curation.retractableMvWithAudit(spark, sfDir)
    val n = audited.count()
    val nRecomputed = audited.filter(col("recomputed")).count()
    assert(n > 0)
    // the recompute set must be a strict minority — the maintenance
    // pass is delta-sized plus a pruned rescan, never a full rebuild
    assert(nRecomputed < n,
      s"recompute path took $nRecomputed of $n groups")
    // closed-form check: a group is flagged iff some retracted cents
    // equals its stored extremum — recompute the flag independently
    // from the raw facts and compare the SETS exactly
    val split = lit("1997-01-01").cast("timestamp")
    val facts = queries.Relational.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"), col("o_orderdate"))
      .filter(col("o_orderdate") < split)
    val stored = facts.groupBy("o_orderpriority", "month")
      .agg(min("cents").as("mn"), max("cents").as("mx"))
    val retracted = facts.filter(
      pmod(col("o_orderkey"), lit(7)) === 0 ||
        (pmod(col("o_orderkey"), lit(7)) =!= 0 &&
          pmod(col("o_orderkey"), lit(11)) === 3))
    val expectFlag = retracted.join(stored,
        Seq("o_orderpriority", "month"))
      .filter(col("cents") === col("mn") || col("cents") === col("mx"))
      .select("o_orderpriority", "month").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val gotFlag = audited.filter(col("recomputed"))
      .select("o_orderpriority", "month")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // flagged groups that survived (n_new > 0) must match the closed
    // form restricted to surviving groups; a flagged group that
    // emptied is simply absent from the view
    assert(gotFlag.subsetOf(expectFlag),
      s"unexpected recompute groups: ${gotFlag -- expectFlag}")
    val surviving = audited
      .select("o_orderpriority", "month")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert((expectFlag & surviving) == gotFlag,
      "every surviving extremum-retracted group must take the rescan")
  }

  test("c16: constructed fixture — a retracted duplicate of the min " +
    "conservatively flags the group, and the rescan heals the value") {
    import spark.implicits._
    // group A: min 10 appears twice, one copy retracted (key 7 % 7 == 0
    // semantics modeled directly): the cheap rule CANNOT know a copy
    // survives, so the group must flag AND still emit min 10
    val facts = Seq(
      (7L, "A", 10L),   // retracted (key % 7 == 0), equals min
      (8L, "A", 10L),   // survives — duplicate of the min
      (9L, "A", 20L),
      (10L, "B", 5L),
      (11L, "B", 6L))   // group B untouched by retraction
      .toDF("k", "g", "cents")
    val state = facts.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"),
        min("cents").as("mn"), max("cents").as("mx"))
    val retracted = facts.filter(pmod(col("k"), lit(7)) === 0)
    val dAgg = retracted.groupBy("g")
      .agg((-count(lit(1))).as("dn"), (-sum("cents")).as("dc"),
        min("cents").as("del_min"), max("cents").as("del_max"))
    val merged = state.join(dAgg, Seq("g"), "left")
      .withColumn("flag", coalesce(
        col("del_min") === col("mn") || col("del_max") === col("mx"),
        lit(false)))
    val flags = merged.select("g", "flag").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(flags("A"), "retracted min duplicate must flag group A")
    assert(!flags("B"), "untouched group must not flag")
    // the healed value: survivors of A still contain min 10
    val healed = facts.filter(pmod(col("k"), lit(7)) =!= 0)
      .filter(col("g") === "A").agg(min("cents")).collect().head
    assert(healed.getLong(0) == 10L)
  }

  // ----------------------- q45 time travel: static version pruning
  test("q45: an as-of-1 read never opens v=2/v=3 delta files, and " +
    "as-of reads honor tombstones and last-writer-wins") {
    val root = queries.Layout.buildVersionedOrders(spark, sfDir)
    val asOf1 = queries.Layout.readOrdersAsOf(spark, root, 1)
    val files = asOf1.inputFiles
    assert(files.nonEmpty)
    assert(!files.exists(f => f.contains("v=2") || f.contains("v=3")),
      "version pruning must exclude later deltas from the scan")
    assert(files.exists(_.contains("v=1")))
    // tombstone honored at v2
    val k2 = queries.Layout.readOrdersAsOf(spark, root, 2)
      .filter(pmod(col("k"), lit(10)) === 2).count()
    assert(k2 == 0, "v2 deletes every k%10==2 row")
    // re-insert overrides the tombstone at v3 for k%20==2 only
    val v3 = queries.Layout.readOrdersAsOf(spark, root, 3)
    val re = v3.filter(pmod(col("k"), lit(20)) === 2).count()
    val gone = v3.filter(pmod(col("k"), lit(20)) === 12).count()
    assert(re > 0, "v3 re-inserts k%20==2")
    assert(gone == 0, "k%20==12 stays deleted at v3")
  }

  // -------------------- s31 IVF rebalance: file-level untouched pin
  test("s31 rebalance: splits only the hottest list — cold lists' " +
    "files untouched, balance improved, ids partitioned exactly") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r13_rebal").toFile
    try {
      val cents = Array(Array(1f, 0f), Array(0f, 1f))
      // cid=0 is HOT (6 vectors along two distinct directions);
      // cid=1 is cold (2 vectors — below the ≥4-row split floor)
      val base = Seq(
        (1L, Seq(1f, 0.01f)), (2L, Seq(1f, 0.02f)),
        (3L, Seq(1f, 0.40f)), (4L, Seq(1f, 0.41f)),
        (5L, Seq(1f, 0.42f)), (6L, Seq(1f, 0.03f)),
        (7L, Seq(0.01f, 1f)), (8L, Seq(0.02f, 1f)))
        .toDF("vec_id", "embedding")
      queries.Similarity.writeIvfIndex(spark, base, cents, root)
      val postingsDir = new java.io.File(root, "postings")
      def files(cid: Int): Map[String, Long] = {
        val d = new java.io.File(postingsDir, s"cid=$cid")
        if (!d.isDirectory) Map.empty
        else d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toMap
      }
      val coldBefore = files(1)
      assert(coldBefore.nonEmpty)
      val sizeBefore = spark.read
        .parquet(postingsDir.getAbsolutePath)
        .groupBy("cid").count().agg(max("count")).collect().head
        .getLong(0)
      val split = queries.Similarity.rebalanceIvfIndex(spark,
        root.getAbsolutePath, splits = 1)
      assert(split == Seq(0), s"hot list is cid=0, split $split")
      assert(files(1) == coldBefore,
        "the cold list's files must be byte-untouched")
      assert(new java.io.File(postingsDir, "cid=2").isDirectory,
        "the fresh sub-list dir must exist")
      val post = spark.read.parquet(postingsDir.getAbsolutePath)
      val sizeAfter = post.groupBy("cid").count()
        .agg(max("count")).collect().head.getLong(0)
      assert(sizeAfter < sizeBefore,
        s"max list must shrink: $sizeBefore -> $sizeAfter")
      // ids partition exactly: all 8 present once
      assert(post.select("vec_id").distinct().count() == 8)
      assert(post.count() == 8)
      // idmap agrees with postings for every id
      val idmap = spark.read
        .parquet(new java.io.File(root, "idmap").getAbsolutePath)
        .select(col("vec_id"), col("cid").as("mc"))
      val mismatch = post.select("vec_id", "cid")
        .join(idmap, Seq("vec_id"))
        .filter(col("cid") =!= col("mc")).count()
      assert(mismatch == 0, "idmap must track the moved ids")
      // centroid table gained exactly one row, and the old slot was
      // refined in place
      val nc = spark.read
        .parquet(new java.io.File(root, "centroids").getAbsolutePath)
        .count()
      assert(nc == 3)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  // ------- s31 crash recovery: orphan lists roll forward on re-run
  test("s31: a rebalance crashed before the centroid commit is " +
    "rolled forward by the next run — orphan lists get adopted " +
    "centroids, nothing is lost or duplicated") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r13_rollfwd").toFile
    try {
      val cents = Array(Array(1f, 0f), Array(0f, 1f))
      val base = Seq(
        (1L, Seq(1f, 0.01f)), (2L, Seq(1f, 0.02f)),
        (3L, Seq(1f, 0.40f)), (4L, Seq(1f, 0.41f)),
        (5L, Seq(1f, 0.42f)), (6L, Seq(1f, 0.03f)),
        (7L, Seq(0.01f, 1f)), (8L, Seq(0.02f, 1f)))
        .toDF("vec_id", "embedding")
      queries.Similarity.writeIvfIndex(spark, base, cents, root)
      queries.Similarity.rebalanceIvfIndex(spark,
        root.getAbsolutePath, splits = 1)
      // simulate the crash window: postings split committed, centroid
      // table NOT — revert centroids to the pre-split 2-row table
      val cDir = new java.io.File(root, "centroids")
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cid", "centroid").coalesce(1)
        .write.mode("overwrite").parquet(cDir.getAbsolutePath)
      // the re-run rolls the commit forward (and finds nothing hot
      // enough to split afterwards — every list is now < 4 rows)
      val split2 = queries.Similarity.rebalanceIvfIndex(spark,
        root.getAbsolutePath, splits = 1)
      assert(split2.isEmpty)
      val nCents = spark.read.parquet(cDir.getAbsolutePath).count()
      assert(nCents == 3, s"orphan list must be adopted, got $nCents")
      val post = spark.read
        .parquet(new java.io.File(root, "postings").getAbsolutePath)
      assert(post.count() == 8 &&
        post.select("vec_id").distinct().count() == 8)
      assert(post.agg(max("cid")).collect().head.getInt(0) < nCents,
        "every posting list must be reachable through a centroid row")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  // ------------- q46 version-log compaction: equivalence + vacuum
  test("q46 compaction: reads at v >= horizon are unchanged, " +
    "vacuumed versions are rejected loudly, and the crash window " +
    "(meta swapped, cleanup pending) reads identically") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_r13_tt").toFile
    try {
      queries.Layout.writeVersionedOrders(spark, sfDir, root)
      def snap(v: Int): Set[String] =
        queries.Layout.readOrdersAsOf(spark, root.getAbsolutePath, v)
          .collect().map(_.toString).toSet
      val v2Before = snap(2)
      val v3Before = snap(3)
      // crash window FIRST: snapshot + meta written, cleanup not run
      // — simulate by compacting then re-creating the folded deltas
      queries.Layout.compactVersions(spark, root.getAbsolutePath, 2)
      assert(snap(2) == v2Before, "post-compaction v2 must be exact")
      assert(snap(3) == v3Before, "post-compaction v3 must be exact")
      // folded inputs are vacuumed
      assert(!new java.io.File(root, "base").isDirectory)
      assert(!new java.io.File(root, "deltas/v=1").isDirectory)
      assert(!new java.io.File(root, "deltas/v=2").isDirectory)
      assert(new java.io.File(root, "deltas/v=3").isDirectory)
      assert(new java.io.File(root, "base_v2").isDirectory)
      // versions behind the horizon are gone BY CONTRACT
      val e = intercept[IllegalArgumentException](snap(1))
      assert(e.getMessage.contains("vacuumed"))
      // crash window: re-surface a folded delta (v=1) as if cleanup
      // died — the snapshot carries version 2, so the stale delta
      // can never override it and reads stay identical
      val o = queries.Relational.table(spark, sfDir, "orders")
        .select(col("o_orderkey").as("k"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
      o.filter(pmod(col("k"), lit(10)) === 1)
        .select(col("k"), (col("cents") + 5).as("cents"),
          lit("U").as("op"))
        .write.parquet(new java.io.File(root, "deltas/v=1")
          .getAbsolutePath)
      assert(snap(2) == v2Before,
        "a not-yet-vacuumed folded delta must not override the snapshot")
      assert(snap(3) == v3Before)
      // a re-run at the same horizon is the crash-recovery path: it
      // finishes the vacuum (the orphan goes) and changes no read
      queries.Layout.compactVersions(spark, root.getAbsolutePath, 2)
      assert(!new java.io.File(root, "deltas/v=1").isDirectory,
        "the re-run must sweep the resurfaced folded delta")
      assert(snap(2) == v2Before && snap(3) == v3Before)
      // compact to 3: a delta-free log
      queries.Layout.compactVersions(spark, root.getAbsolutePath, 3)
      assert(snap(3) == v3Before)
      assert(!new java.io.File(root, "deltas/v=3").isDirectory)
      assert(!new java.io.File(root, "base_v2").isDirectory,
        "the superseded snapshot is vacuumed")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  // ---------- st36 streamed retraction MV: replay + state invariants
  test("st36: a replayed micro-batch re-derives identical base and " +
    "view bytes (before-images make the fold state-lookup-free), and " +
    "the maintained base equals the net CDC state") {
    val root = queries.Streaming.buildRetractMvStream(spark, sfDir)
    val basePath = new java.io.File(root, "base").getAbsolutePath
    val viewPath = new java.io.File(root, "view").getAbsolutePath
    def rows(p: String): Set[String] =
      spark.read.parquet(p).collect().map(_.toString).toSet
    val baseBefore = rows(basePath)
    val epoch4Before = rows(s"$viewPath/epoch=4")
    // replay the LAST batch verbatim from its staged source file —
    // the only replay checkpointed streaming can produce (a crash
    // re-runs the uncommitted tail batch; earlier batches are
    // committed and never re-fire), so the base state the replay
    // sees is exactly the state the original run left
    val b3 = spark.read.parquet(
      new java.io.File(root, "src/epoch-003.parquet").getAbsolutePath)
    queries.Streaming.st36ApplyBatch(spark, b3, 3L, basePath, viewPath)
    assert(rows(basePath) == baseBefore,
      "replayed batch must leave the base table byte-identical")
    assert(rows(s"$viewPath/epoch=4") == epoch4Before,
      "replayed batch must re-derive the identical view epoch")
    // the maintained base == the net CDC state (deletes gone,
    // updates applied, inserts present)
    val split = lit(queries.Curation.C16Split).cast("timestamp")
    val facts = queries.Curation.c16Facts(spark, sfDir)
    val expect = facts.filter(col("o_orderdate") < split)
      .filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
      .withColumn("cents",
        when(pmod(col("o_orderkey"), lit(11)) === 3,
          col("cents") + 10000L).otherwise(col("cents")))
      .unionByName(facts.filter(col("o_orderdate") >= split))
      .select("o_orderkey", "cents")
    val got = spark.read.parquet(basePath).select("o_orderkey", "cents")
    assert(got.count() == expect.count())
    assert(got.join(expect, Seq("o_orderkey", "cents")).count() ==
      expect.count(), "maintained base must equal the net CDC state")
    // all five epochs kept — the view is time-travelable
    val epochs = new java.io.File(root, "view").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("epoch="))
    assert(epochs == 5)
  }

  // ---------- st37 streamed ANALYZE: catalog parity + replay
  test("st37: stream-maintained stats fold to an exact count and a " +
    "BIT-identical KMV state, the GK merge stays in band, the " +
    "decisions match the exact replay, and a replayed batch row is " +
    "byte-stable") {
    val rows = queries.Streaming.analyzeStreamed(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("n_match"), "exact count must fold exactly")
      assert(r.getAs[Boolean]("kmv_match"),
        "per-batch KMV union must equal the one-shot sketch bit-for-bit")
      assert(r.getAs[Boolean]("gk_band_ok"))
      assert(r.getAs[Boolean]("decision_matches_exact"))
    }
    val root = queries.Streaming.buildStreamedAnalyze(spark, sfDir)
    val statsDir = new java.io.File(root, "stats")
    assert(statsDir.listFiles().count(_.getName.startsWith("batch=")) == 4)
    // replay: re-derive batch 2's catalog row from its staged slice
    // and overwrite — the row set must not move (idempotent, the
    // st34 per-batch-artifact discipline)
    def statRows(): Set[String] = spark.read
      .parquet(statsDir.getAbsolutePath)
      .selectExpr("n", "xxhash64(cast(sk as string)) as skh",
        "xxhash64(cast(gk as string)) as gkh", "batch")
      .collect().map(_.toString).toSet
    val before = statRows()
    val slice = spark.read.parquet(
      new java.io.File(root, "src/epoch-002.parquet").getAbsolutePath)
    slice.agg(count(lit(1)).as("n"),
        graft.expr.KmvSketchAgg.kmvSketch(
          xxhash64(col("l_orderkey")), queries.Sketches.JoinK).as("sk"),
        graft.expr.GkSketchAgg.gkSketch(col("price"),
          queries.Sketches.SelAccuracy).as("gk"))
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(statsDir, "batch=2").getAbsolutePath)
    assert(statRows() == before,
      "a replayed per-batch catalog row must be byte-stable")
  }

  // ------------------- st35 streamed BM25 ingest: index state checks
  test("st35: the stream-built index has no duplicate postings and " +
    "its totals match the corpus exactly (replaces folded in-stream)") {
    val root = queries.Streaming.buildIngestedBm25Index(spark, sfDir)
    val postings = spark.read
      .parquet(new java.io.File(root, "postings").getAbsolutePath)
    val dup = postings.groupBy("token", "doc_id")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    assert(dup == 0, "slice-1 replace batch must not duplicate postings")
    val totals = queries.Similarity.readBm25Totals(spark, root)
      .collect().head
    val docs = queries.Relational.table(spark, sfDir, "documents")
    val exp = docs.agg(count(lit(1)),
      sum(size(split(col("text"), " ")).cast("long"))).collect().head
    assert(totals.getLong(0) == exp.getLong(0))
    assert(totals.getLong(1) == exp.getLong(1))
  }
}
