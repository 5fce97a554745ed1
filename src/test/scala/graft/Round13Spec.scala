package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: the r12 ADVICE fixes (s25 emptied-list
  * eviction, sk10 executed-plan audit, TmpHousekeeping unknown-owner
  * safety, gk_rank NaN guard) and the round's new operators.
  */
class Round13Spec extends SparkSpec {

  // --------------------------------- s25 emptied-list eviction (ADVICE)
  test("s25 upsert: a replace that moves its list's ONLY vector away " +
    "deletes the emptied cid= directory (no stale duplicate at serve)") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r13_emptied").toFile
    try {
      val cents = Array(Array(1f, 0f), Array(0f, 1f))
      // id 4 is cid=0's ONLY member
      val base = Seq(
        (4L, Seq(1f, 0.02f)),                        // alone in cid=0
        (5L, Seq(0.01f, 1f)), (6L, Seq(0.02f, 1f)))  // cid=1
        .toDF("vec_id", "embedding")
      queries.Similarity.writeIvfIndex(spark, base, cents, root)
      val postingsDir = new java.io.File(root, "postings")
      assert(new java.io.File(postingsDir, "cid=0").isDirectory)
      // the batch moves 4 to cid=1 and assigns NOTHING back to cid=0:
      // the merged frame has no cid=0 rows, so dynamic overwrite alone
      // would leave the stale directory (the r12 ADVICE edge)
      val move = Seq((4L, Seq(0.05f, 1f))).toDF("vec_id", "embedding")
      queries.Similarity.upsertIvfIndex(spark, root.getAbsolutePath,
        move)
      assert(!new java.io.File(postingsDir, "cid=0").exists(),
        "emptied posting list's cid= directory must be deleted")
      val post = spark.read.parquet(postingsDir.getAbsolutePath)
      val four = post.filter(col("vec_id") === 4L).collect()
      assert(four.length == 1,
        s"moved id must exist exactly once, got ${four.length}")
      assert(four.head.getInt(four.head.fieldIndex("cid")) == 1)
      assert(four.head.getSeq[Float](
        four.head.fieldIndex("embedding")) == Seq(0.05f, 1f),
        "the surviving row must carry the NEW payload")
      assert(post.count() == 3)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  // ------------------------------------- gk_rank NaN guard (ADVICE)
  test("gk_rank(state, NaN) returns null, not a spurious rank") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = (1 to 100).map(_.toDouble).toDF("x")
      .agg(expr("gk_sketch(x, 100)").as("st"))
      .select(
        expr("gk_rank(st, CAST('NaN' AS DOUBLE))").as("r_nan"),
        expr("gk_rank(st, 50.0)").as("r_mid"))
      .collect().head
    assert(df.isNullAt(0), "NaN rank must be null")
    val mid = df.getDouble(1)
    assert(mid > 40 && mid < 60, s"sanity: rank(50) ≈ 50, got $mid")
  }

  // ------------------------ TmpHousekeeping owner safety (ADVICE)
  test("sweep: a dir with NO heartbeat is unknown-owner and survives " +
    "at 3h; a dir whose owner's heartbeat is stale is collected") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val threeHoursAgo = System.currentTimeMillis() - 3L * 3600 * 1000
    // unknown owner: old dir, no graft_owner_ file at all
    val orphan = new java.io.File(tmp, "graft_thing_unknownsib42")
    orphan.mkdirs()
    orphan.setLastModified(threeHoursAgo)
    // known-dead owner: old dir + stale heartbeat
    val dead = new java.io.File(tmp, "graft_thing_deadapp_77_3")
    dead.mkdirs()
    dead.setLastModified(threeHoursAgo)
    val hb = new java.io.File(tmp, "graft_owner_deadapp_77_3")
    hb.createNewFile()
    hb.setLastModified(threeHoursAgo)
    try {
      core.TmpHousekeeping.arm("r13sweeptest")
      assert(orphan.isDirectory,
        "no-heartbeat dir is unknown-owner: must survive a 3h sweep")
      assert(!dead.exists(),
        "stale-heartbeat owner's dir must be collected " +
          "(underscore appId resolved by suffix match, not parsing)")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(orphan)
      org.apache.commons.io.FileUtils.deleteDirectory(dead)
      hb.delete()
      // re-arm the real app so later suites keep their heartbeat
      core.TmpHousekeeping.arm(spark.sparkContext.applicationId)
    }
  }

  // ------------------------------ gr11/gr12 degree-cap knob
  test("lpa cap: cap=MaxValue is vacuous (identical fixpoint), a " +
    "finite cap keeps the lowest-(degree, id) neighbors and still " +
    "labels every node") {
    import spark.implicits._
    // star + appendage: node 1 is a hub (touches everyone); 5↔6 is a
    // low-degree pair a cap=1 vote keeps while dropping the hub
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (5L, 6L))
    val e = (pairs ++ pairs.map(_.swap))
      .toDF("src", "dst").localCheckpoint()
    val default = queries.Graph.lpaOnEdges(e, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vacuous = queries.Graph.lpaOnEdges(e, 3, Int.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(default == vacuous, "cap=MaxValue must be a no-op")
    val capped = queries.Graph.lpaOnEdges(e, 3, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped.keySet == default.keySet,
      "a capped run must still label every node (seeding is uncapped)")
    // capNeighbors at cap=1: degrees — 1:4, 5:2, others:1. Node 6's
    // only in-edge (5→6) survives; node 5 keeps 6 (deg 1 < hub's 4);
    // the hub keeps one lowest-degree spoke (2).
    val kept = queries.Graph.capNeighbors(e, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept.size == 6, s"one in-edge per dst, got $kept")
    assert(kept.contains((6L, 5L)) && kept.contains((5L, 6L)))
    assert(kept.contains((2L, 1L)), // hub votes: lowest (deg,id) = 2
      s"hub must keep its lowest-(deg,id) neighbor, kept $kept")
  }

  test("gr12 modularity: capped LPA labels feed an UNCAPPED audit " +
    "(same schema, every community accounted)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L),
      (11L, 12L), (12L, 10L))
    val e = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = queries.Graph.modularityOnEdges(e, 3, 2).collect()
    // two disjoint triangles, cap=2 == full in-degree → same as default
    val base = queries.Graph.modularityOnEdges(e, 3).collect()
    assert(out.map(_.toString).sorted.sameElements(
      base.map(_.toString).sorted))
    assert(out.map(_.getAs[Long]("d_c")).sum == 12L,
      "audit must count the FULL edge list regardless of cap")
  }

  // ------------------------------ sk11 composed CBO planner
  test("sk11: the narrow predicate FLIPS the join order (selectivity " +
    "-> order coupling); every decision audited and exact-replayable") {
    val rows = queries.Sketches.cboPlanner(spark, sfDir)
      .collect().map(r => r.getAs[String]("scenario") -> r).toMap
    val narrow = rows("narrow"); val wide = rows("wide")
    assert(wide.getAs[String]("chosen_first") == "customer-orders",
      "wide predicate must keep the unfiltered sk10 order")
    assert(narrow.getAs[String]("chosen_first") == "orders-lineitem",
      "narrow predicate must flip the order to filter-first")
    for (r <- Seq(narrow, wide)) {
      assert(r.getAs[Boolean]("order_audit"),
        s"${r.getAs[String]("scenario")}: innermost executed join " +
          "must be the chosen pair")
      assert(r.getAs[Boolean]("strategy_audit"),
        s"${r.getAs[String]("scenario")}: executed operators must " +
          "match decided strategies " +
          s"(${r.getAs[String]("executed_inner")}/" +
          s"${r.getAs[String]("executed_outer")} vs " +
          s"${r.getAs[String]("inner_strategy")}/" +
          s"${r.getAs[String]("outer_strategy")})")
      assert(r.getAs[Boolean]("decision_matches_exact"),
        s"${r.getAs[String]("scenario")}: est decisions must match " +
          "exact replay at gate SF")
      assert(r.getAs[Long]("final_rows") > 0)
    }
  }

  // ------------------------------ s29 stored hybrid retrieval
  test("s29: stored-served lexical arm is rank-identical to s26's, " +
    "vector recall holds, fusion arithmetic exact") {
    val row = queries.Similarity.hybridStoredInv(spark, sfDir)
      .collect().head
    assert(row.getAs[Boolean]("lex_identical"),
      "stored BM25 serve must reproduce the in-plan arm rank for rank")
    assert(row.getAs[Boolean]("vec_recall_ok"))
    assert(row.getAs[Boolean]("fusion_ok"))
    assert(row.getAs[Long]("n_queries") == 8L)
  }

  test("s29: lexical serve prunes postings buckets statically when " +
    "the vocabulary misses buckets (and never exceeds the total)") {
    val (touched, total) =
      queries.Similarity.bm25BucketsTouched(spark, sfDir)
    assert(touched >= 1 && touched <= total,
      s"touched $touched of $total")
    // the pruning MECHANISM is what matters: the serve filter lists
    // exactly the touched buckets, so the scan opens at most that
    // many partition directories (at tiny SF some of the 16 buckets
    // hold no tokens at all and are never even written)
    assert(total >= 1 && total <= 16, s"got $total tb= dirs")
  }

  // ------------------------------ st34 manifest compaction
  test("st34 compaction: reader row set unchanged, manifest dir count " +
    "drops, re-compaction is idempotent, oracle answer unchanged") {
    import org.apache.spark.sql.functions.col
    val fixture = java.nio.file.Files
      .createTempDirectory("graft_r13_zm").toFile
    try {
      import spark.implicits._
      val root = fixture.getAbsolutePath
      // five synthetic ingest batches over three shards
      (0L to 4L).foreach { id =>
        val b = Seq(
          (100 * id + 1, f"1995-0${id + 1}%s-01", (id % 3).toInt),
          (100 * id + 2, f"1995-0${id + 1}%s-15", ((id + 1) % 3).toInt))
          .toDF("l_orderkey", "ship_day", "shard")
        queries.Streaming.st34WriteBatch(b, id, root)
      }
      def dirCount(sub: String): Int = {
        val d = new java.io.File(root, sub)
        if (!d.isDirectory) 0
        else d.listFiles().count(_.isDirectory)
      }
      def rows(): Set[String] =
        queries.Streaming.st34ReadManifests(spark, root)
          .collect().map(_.toString).toSet
      val before = rows()
      assert(dirCount("manifests") == 5)
      queries.Streaming.st34CompactManifests(spark, root, upTo = 2L)
      assert(rows() == before, "compaction must not change the rows")
      assert(dirCount("manifests") == 2, "batches 0-2 folded away")
      assert(dirCount("manifests_epoch") == 1)
      // replayed compaction (same upTo): byte-stable, still equal
      queries.Streaming.st34CompactManifests(spark, root, upTo = 2L)
      assert(rows() == before)
      // a later compaction folds the tail AND the earlier epoch
      queries.Streaming.st34CompactManifests(spark, root, upTo = 4L)
      assert(rows() == before)
      assert(dirCount("manifests") == 0)
      assert(dirCount("manifests_epoch") == 1, "one epoch file remains")
      // crash-window simulation: epoch holds batch rows that also
      // reappear in manifests (undeleted input) — reader stays exact
      val b0 = Seq((1L, "1995-01-01", 0))
        .toDF("l_orderkey", "ship_day", "shard")
        .groupBy("shard")
        .agg(org.apache.spark.sql.functions.min(col("ship_day")).as("lo"),
          org.apache.spark.sql.functions.max(col("ship_day")).as("hi"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
      b0.coalesce(1).write.mode("overwrite")
        .parquet(s"$root/manifests/batch=0")
      assert(rows() == before,
        "a re-surfaced folded batch must deduplicate exactly")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(fixture)
    }
  }

  // ------------------------------ s30 BM25 postings upsert
  test("s30 upsert: a changed-text replace evicts the old postings " +
    "via the docmap, drops a vanished token from the dict, moves " +
    "totals by the exact delta, and replays idempotently") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r13_bm25").toFile
    try {
      // 'zebra' occurs ONLY in doc 2 — replacing doc 2's text must
      // remove it from postings AND dict entirely
      val base = Seq(
        (1L, "apple banana apple"),
        (2L, "zebra cherry"),
        (3L, "banana cherry date"))
        .toDF("doc_id", "text")
      queries.Similarity.writeBm25Index(spark, base, root)
      def postings() = spark.read
        .parquet(new java.io.File(root, "postings").getAbsolutePath)
      def dict() = spark.read
        .parquet(new java.io.File(root, "dict").getAbsolutePath)
      def totals() = queries.Similarity
        .readBm25Totals(spark, root.getAbsolutePath)
        .collect().head
      assert(totals().getLong(0) == 3 && totals().getLong(1) == 8)
      assert(dict().filter(col("token") === "zebra").count() == 1)
      // replace doc 2 (zebra vanishes) + insert doc 4
      val batch = Seq(
        (2L, "apple elderberry"),
        (4L, "fig"))
        .toDF("doc_id", "text")
      queries.Similarity.upsertBm25Index(spark,
        root.getAbsolutePath, batch)
      assert(postings().filter(col("token") === "zebra").count() == 0,
        "replaced doc's old tokens must be evicted via the docmap")
      assert(dict().filter(col("token") === "zebra").count() == 0,
        "a vanished token must leave the dict")
      // df('apple') now 2 (docs 1 and 2)
      val apple = dict().filter(col("token") === "apple").collect()
      assert(apple.length == 1 && apple.head.getAs[Long]("df") == 2)
      // totals: 4 docs; tokens 3 + 2 + 3 + 1 = 9
      assert(totals().getLong(0) == 4 && totals().getLong(1) == 9,
        s"totals moved wrong: ${totals()}")
      val rowSet = postings().collect().map(_.toString).toSet
      // replay the same batch: byte-stable
      queries.Similarity.upsertBm25Index(spark,
        root.getAbsolutePath, batch)
      assert(postings().collect().map(_.toString).toSet == rowSet,
        "replayed upsert must be a no-op on the postings row set")
      assert(totals().getLong(0) == 4 && totals().getLong(1) == 9,
        "replayed upsert must not move totals")
      // no (token, doc) duplicates anywhere
      assert(postings().groupBy("token", "doc_id")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1).count() == 0)
      // crash-window discipline: totals are DERIVED per doc bucket,
      // never read-modify-written — corrupt a touched bucket's
      // subtotal (the state a crash between publishes could leave)
      // and a replay must heal it rather than compound it
      val tDir = new java.io.File(root, "totals")
      // a bucket the batch touches (doc 4's), via the same hash
      val corruptDb = Seq(4L).toDF("doc_id")
        .select(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(col("doc_id")),
          org.apache.spark.sql.functions.lit(
            queries.Similarity.Bm25Buckets)).cast("int"))
        .collect().head.getInt(0)
      Seq((999L, 999L)).toDF("n_docs", "t_tokens")
        .coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(tDir, s"db=$corruptDb")
          .getAbsolutePath)
      assert(totals().getLong(0) != 4, "corruption visible pre-replay")
      queries.Similarity.upsertBm25Index(spark,
        root.getAbsolutePath, batch)
      assert(totals().getLong(0) == 4 && totals().getLong(1) == 9,
        "replay must re-derive touched subtotals, not add a delta")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root)
    }
  }

  test("s30 on gate data: upserted BM25 serve == full-rebuild serve, " +
    "stored totals exact") {
    val row = queries.Similarity.bm25UpsertedInv(spark, sfDir)
      .collect().head
    assert(row.getAs[Boolean]("serve_parity"))
    assert(row.getAs[Boolean]("no_dup"))
    assert(row.getAs[Long]("n_docs") > 0)
  }

  // --------------------------- sk10 audit reads the EXECUTED plan
  test("sk10: order audit holds on the count's own post-AQE plan") {
    val row = queries.Sketches.cboJoinOrder(spark, sfDir)
      .collect().head
    assert(row.getAs[Boolean]("order_audit"),
      "innermost executed join must be the chosen pair")
    assert(row.getAs[Boolean]("decision_matches_exact"))
  }
}
