package graft

import org.apache.spark.sql.functions._

/** Round-14: the r13-advice hardening (s31's postings↔idmap crash
  * window, q46's atomic meta swap, BM25's no-null-text precondition)
  * and the round's new operators.
  */
class Round14Spec extends SparkSpec {

  // ---- s31 crash window #2: postings published, idmap NOT.
  // Round13bSpec pins the centroid window; this pins the one before
  // it — a stale idmap row would send a later upsert's eviction to
  // the wrong list and leave the id duplicated.
  test("s31 roll-forward: a rebalance crashed between the postings " +
    "publish and the idmap publish is repaired — idmap re-derived " +
    "from the orphan postings, and a subsequent upsert of a moved " +
    "id stays duplicate-free") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r14_rollfwd_idmap").toFile
    try {
      val cents = Array(Array(1f, 0f), Array(0f, 1f))
      val base = Seq(
        (1L, Seq(1f, 0.01f)), (2L, Seq(1f, 0.02f)),
        (3L, Seq(1f, 0.40f)), (4L, Seq(1f, 0.41f)),
        (5L, Seq(1f, 0.42f)), (6L, Seq(1f, 0.03f)),
        (7L, Seq(0.01f, 1f)), (8L, Seq(0.02f, 1f)))
        .toDF("vec_id", "embedding")
      queries.Similarity.writeIvfIndex(spark, base, cents, root)
      // snapshot idmap + centroids BEFORE the split so both can be
      // reverted — simulating a crash right after the postings publish
      val idmapDir = new java.io.File(root, "idmap")
      val centsDir = new java.io.File(root, "centroids")
      val idmapSnap = new java.io.File(root.getParentFile,
        root.getName + "_idmap_snap")
      org.apache.commons.io.FileUtils.copyDirectory(idmapDir, idmapSnap)
      queries.Similarity.rebalanceIvfIndex(spark,
        root.getAbsolutePath, splits = 1)
      org.apache.commons.io.FileUtils.deleteDirectory(idmapDir)
      org.apache.commons.io.FileUtils.copyDirectory(idmapSnap, idmapDir)
      org.apache.commons.io.FileUtils.deleteDirectory(idmapSnap)
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cid", "centroid").coalesce(1)
        .write.mode("overwrite").parquet(centsDir.getAbsolutePath)
      // sanity: the simulated state really is inconsistent
      val postingsDir = new java.io.File(root, "postings")
      def disagreements(): Long = {
        val post = spark.read.parquet(postingsDir.getAbsolutePath)
          .select(col("vec_id"), col("cid"))
        val im = spark.read.parquet(idmapDir.getAbsolutePath)
          .select(col("vec_id"), col("cid").as("mc"))
        post.join(im, Seq("vec_id"))
          .filter(col("cid") =!= col("mc")).count()
      }
      assert(disagreements() > 0,
        "the crash simulation must leave stale idmap rows")
      // the next run rolls the interrupted commit forward in full
      queries.Similarity.rebalanceIvfIndex(spark,
        root.getAbsolutePath, splits = 1)
      assert(disagreements() == 0,
        "roll-forward must re-derive idmap rows for orphan lists")
      assert(spark.read.parquet(centsDir.getAbsolutePath).count() == 3)
      // the scenario the stale map would corrupt: upsert a REPLACE of
      // a vec_id that the split moved to the fresh list, with an
      // embedding that assigns to a different list — must evict from
      // the list the id actually lives in, leaving exactly one copy
      val post0 = spark.read.parquet(postingsDir.getAbsolutePath)
      val movedId = post0.filter(col("cid") === 2)
        .select("vec_id").limit(1).collect().head.getLong(0)
      val replace = Seq((movedId, Seq(0.03f, 1f)))
        .toDF("vec_id", "embedding")
      queries.Similarity.upsertIvfIndex(spark, root.getAbsolutePath,
        replace)
      val post = spark.read.parquet(postingsDir.getAbsolutePath)
      assert(post.filter(col("vec_id") === movedId).count() == 1,
        "a replaced moved id must appear exactly once after upsert")
      assert(post.count() == 8 &&
        post.select("vec_id").distinct().count() == 8)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  // ---- q46 meta swap: crash windows of the rename pair
  test("q46 meta pointer: a crash that loses meta/ mid-swap is " +
    "recovered from the newest complete snapshot; a partial meta " +
    "dir falls back the same way; re-compaction converges") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_r14_ttmeta").toFile
    try {
      queries.Layout.writeVersionedOrders(spark, sfDir, root)
      def snap(v: Int): Set[String] =
        queries.Layout.readOrdersAsOf(spark, root.getAbsolutePath, v)
          .collect().map(_.toString).toSet
      val v2Before = snap(2)
      val v3Before = snap(3)
      queries.Layout.compactVersions(spark, root.getAbsolutePath, 2)
      val metaDir = new java.io.File(root, "meta")
      assert(metaDir.isDirectory)
      // window 1: meta/ gone entirely (between the two renames)
      org.apache.commons.io.FileUtils.deleteDirectory(metaDir)
      assert(queries.Layout.ttMeta(spark, root.getAbsolutePath) ==
        (2, "base_v2"),
        "ttMeta must recover the pointer from the newest snapshot")
      assert(snap(2) == v2Before && snap(3) == v3Before,
        "reads through the recovered pointer must be exact")
      // a read below the recovered horizon still fails loudly
      intercept[IllegalArgumentException] {
        queries.Layout.readOrdersAsOf(spark, root.getAbsolutePath, 1)
          .collect()
      }
      // window 2: meta/ present but PARTIAL (no readable parquet)
      assert(metaDir.mkdirs())
      java.nio.file.Files.write(
        new java.io.File(metaDir, "part-00000.parquet").toPath,
        Array[Byte](1, 2, 3))
      assert(queries.Layout.ttMeta(spark, root.getAbsolutePath) ==
        (2, "base_v2"),
        "a partial meta dir must fall back, not throw")
      // re-compaction from the recovered state converges: pointer
      // rewritten, reads unchanged
      org.apache.commons.io.FileUtils.deleteDirectory(metaDir)
      queries.Layout.compactVersions(spark, root.getAbsolutePath, 3)
      assert(snap(3) == v3Before)
      assert(queries.Layout.ttMeta(spark, root.getAbsolutePath) ==
        (3, "base_v3"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  // ---- sk12: the CBO loop closed into Catalyst
  test("sk12: the optimizer rule rewrites the hint-free query to the " +
    "stats-chosen plan (order flip on narrow, user order on wide) " +
    "and the rule-off replay runs the user's unhinted plan") {
    val rows = queries.Sketches.cboApplied(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("narrow", "wide"))
    rows.foreach { case (scenario, r) =>
      def b(n: String) = r.getBoolean(r.fieldIndex(n))
      def s(n: String) = r.getString(r.fieldIndex(n))
      assert(b("order_audit"),
        s"$scenario: executed first join ${s("executed_first")} != " +
          s"chosen ${s("chosen_first")}")
      assert(b("strategy_audit"),
        s"$scenario: executed ops (${s("executed_inner")}, " +
          s"${s("executed_outer")}) != decided " +
          s"(${s("inner_strategy")}, ${s("outer_strategy")})")
      assert(b("ruleoff_audit"),
        s"$scenario: rule-off run was not the user's unhinted plan " +
          s"(${s("ruleoff_first")}, ${s("ruleoff_inner")}, " +
          s"${s("ruleoff_outer")})")
      assert(b("decision_matches_exact"), s"$scenario: est decision " +
        "diverged from the exact replay")
    }
    // the flip: narrow's ~1% predicate must move the executed order
    // away from the order the user wrote — the rule is load-bearing
    assert(rows("narrow").getBoolean(
      rows("narrow").fieldIndex("rule_load_bearing")),
      "narrow must flip the join order away from the user's")
    assert(rows("narrow").getString(
      rows("narrow").fieldIndex("executed_first")) == "orders-lineitem")
    assert(!rows("wide").getBoolean(
      rows("wide").fieldIndex("rule_load_bearing")),
      "wide must keep the user's order")
  }

  // ---- BM25 no-null-text precondition: loud, not silent
  test("BM25 build and upsert reject null-text documents loudly " +
    "(a silent drop would diverge n_docs from an all-docs oracle)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r14_bm25null").toFile
    try {
      val bad = Seq((1L, "a b"), (2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")
      intercept[IllegalArgumentException] {
        queries.Similarity.writeBm25Index(spark, bad, root)
      }
      val good = Seq((1L, "a b"), (2L, ""), (3L, "c a"))
        .toDF("doc_id", "text")
      queries.Similarity.writeBm25Index(spark, good, root)
      // empty-STRING text still posts (one "" token) — all 3 docs
      // survive into the derived totals
      val totals = queries.Similarity
        .readBm25Totals(spark, root.getAbsolutePath).collect().head
      assert(totals.getLong(0) == 3, s"n_docs=${totals.getLong(0)}")
      intercept[IllegalArgumentException] {
        queries.Similarity.upsertBm25Index(spark,
          root.getAbsolutePath,
          Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }
}
