package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.queries.{Multimodal, Sampling, Sources, TextAnalysis}
import graft.streaming.EventStreams

/** Invariants for the late-round-5 operators: ORC roundtrip, epoch
  * shuffle, BM25 retrieval, length-binned batching, audio resample,
  * stream-static enrichment. The DuckDB oracle proves value equality;
  * these specs pin the CONTRACTS (permutation density, determinism
  * across layouts, batch caps, codec algebra, stream==batch). */
class Round5bSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- j03 ORC roundtrip
  test("orc roundtrip: aggregate-lossless and byte-identical text") {
    val orig = graft.queries.Relational.table(spark, sfDir, "documents")
      .filter(col("lang") === "de")
      .select(col("doc_id"), col("text"))
    val out = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_spec_orc_${spark.sparkContext.applicationId}")
      .getAbsolutePath
    orig.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    // row-for-row text equality through the ORC cycle, not just sums
    val mismatched = orig.as("a").join(back.as("b"), "doc_id")
      .filter(col("a.text") =!= col("b.text")).count()
    assert(mismatched == 0)
    assert(back.count() == orig.count())
  }

  // ------------------------------------------------- s09 epoch shuffle
  test("epoch shuffle: pos is a dense permutation matching the global " +
    "key order, stable across partition layouts") {
    val shuffled = Sampling.epochShuffle(spark, sfDir)
    val rows = shuffled.collect()
    val n = rows.length
    val positions = rows.map(_.getLong(2)).sorted
    assert(positions.sameElements(0L until n),
      "positions must be exactly 0..n-1")
    // bucketed two-phase rank == naive global order by key
    val naive = rows.sortBy(r => (r.getString(1), r.getLong(0)))
      .map(_.getLong(0))
    val byPos = rows.sortBy(_.getLong(2)).map(_.getLong(0))
    assert(naive.sameElements(byPos),
      "bucket+offset rank must equal the single-window global rank")
    // same result when the source is force-repartitioned differently
    // (operator hashes doc_id only — layout must not matter); proxy:
    // re-run and compare (plan re-executes with fresh sampling of
    // everything non-deterministic, if there were any)
    val again = Sampling.epochShuffle(spark, sfDir).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      rows.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }

  // ------------------------------------------------- t19 BM25 retrieval
  test("bm25: returned docs contain a query term, scores ranked, " +
    "saturation bounded") {
    val top = TextAnalysis.bm25TopK(spark, sfDir).collect()
    assert(top.nonEmpty && top.length <= 10)
    val scores = top.map(_.getLong(1))
    assert(scores.sameElements(scores.sortBy(-_)),
      "output must be ranked by score desc")
    assert(top.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3),
      "terms-hit must be within the query set size")
    // every returned doc really contains at least one query term
    val ids = top.map(_.getLong(0)).toSeq
    val withTerm = graft.queries.Relational
      .table(spark, sfDir, "documents")
      .filter(col("doc_id").isin(ids: _*))
      .filter(col("text").rlike("\\b(join|vector|stream)\\b"))
      .count()
    assert(withTerm == ids.length)
  }

  // -------------------------------------------- t20 length-binned batches
  test("length batches: batch cap respected, waste non-negative, " +
    "token totals conserved") {
    val batches = TextAnalysis.lengthBinnedBatches(spark, sfDir).collect()
    assert(batches.forall(_.getLong(3) <= 8), "batch cap is 8 docs")
    assert(batches.forall(r => r.getLong(6) >= 0), "waste >= 0")
    assert(batches.forall(r =>
      r.getLong(5) == r.getLong(3) * r.getLong(0)),
      "padded = n_docs * bin")
    val totalTokens = batches.map(_.getLong(4)).sum
    val corpus = graft.queries.Relational
      .table(spark, sfDir, "documents")
      .agg(sum(size(split(col("text"), " ")).cast("long")))
      .head().getLong(0)
    assert(totalTokens == corpus,
      "every corpus token lands in exactly one batch")
  }

  // --------------------------------------------- mm07 audio resample
  test("decimate2: keeps even indices, halves length, codec round-trip") {
    val samples = Array[Short](10, -20, 30, -40, 50)
    assert(Multimodal.decimate2(samples).sameElements(
      Array[Short](10, 30, 50)))
    assert(Multimodal.decimate2(Array[Short](1, 2)).sameElements(
      Array[Short](1)))
    // through the real codec: synth a WAV, decode, decimate — the
    // survivors are exactly the even-position synth samples
    val payload = "abcdefg".getBytes("US-ASCII")
    val wav = Multimodal.decodeWav(Multimodal.synthWav(payload))
    val half = Multimodal.decimate2(wav.samples)
    assert(half.length == 4)
    val expect = Array(0, 2, 4, 6)
      .map(i => (((payload(i) & 0xff) - 128) * 256).toShort)
    assert(half.sameElements(expect))
  }

  // --------------------------------------------- d10 incremental dedup
  test("incremental dedup: planted cross-batch duplicates rejected, " +
    "every survivor genuinely absent from the corpus") {
    val survivors = graft.queries.Dedup
      .incrementalDedup(spark, sfDir).collect()
    val ids = survivors.map(_.getLong(0)).toSet
    val base = graft.queries.Relational.table(spark, sfDir, "documents")
    val maxId = base.agg(max(col("doc_id"))).head().getLong(0)
    // every planted duplicate (donor exists) must be rejected
    val planted = (0L to maxId by 30).filter(_ + 1 <= maxId)
    assert(planted.forall(!ids.contains(_)),
      "planted duplicates must not survive the anti-join")
    // every survivor's fingerprint really is new vs the corpus
    val corpusFps = base.filter(col("doc_id") % 10 =!= 0)
      .select(md5(col("text"))).collect().map(_.getString(0)).toSet
    assert(survivors.forall(r => !corpusFps.contains(r.getString(1))))
  }

  // --------------------------------------------- q25 corr subquery
  test("correlated subquery: flagged orders exceed 1.5x their " +
    "customer's average, cross-checked via DataFrame aggregation") {
    val flagged = graft.queries.Relational
      .q25CorrSubquery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged.nonEmpty)
    import org.apache.spark.sql.types.DecimalType
    val o = graft.queries.Relational.table(spark, sfDir, "orders")
    val perCust = o.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("s"),
        count(lit(1)).as("n"))
    val expect = o.join(perCust, "o_custkey")
      .filter(col("o_totalprice").cast(DecimalType(18, 2)) * 2 * col("n")
        > col("s") * 3)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == expect)
  }

  // ------------------------------------------------- t21 dup n-grams
  test("dup n-grams: dup count bounded by gram count, short docs " +
    "excluded, corpus has repeated spans") {
    val r = TextAnalysis.dupNgramFraction(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getLong(2) <= x.getLong(1)),
      "a doc cannot have more duplicated grams than grams")
    assert(r.forall(_.getLong(1) >= 1), "only docs with >= n tokens emit")
    assert(r.map(_.getLong(2)).sum > 0,
      "the synthetic corpus plants repeated spans — some must surface")
  }

  // ------------------------------------------------- q24 status pivot
  test("pivot: wide counts partition the orders table exactly") {
    val wide = graft.queries.Relational
      .q24StatusPivot(spark, sfDir).collect()
    val total = graft.queries.Relational.table(spark, sfDir, "orders")
      .count()
    assert(wide.map(r => r.getLong(1) + r.getLong(3) + r.getLong(5)).sum
      == total, "F_n + O_n + P_n across years must count every order")
  }

  // ------------------------------------------- l03 sorted neighborhood
  test("sorted neighborhood: bounded gaps, single-edit pairs, no dups, " +
    "deterministic") {
    val pairs = graft.queries.Linkage
      .sortedNeighborhood(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getLong(2) <= 1), "dist <= 1")
    assert(pairs.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3),
      "rank gap within the neighborhood window")
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length,
      "each (identity, corrupted) pair emitted once")
    val again = graft.queries.Linkage
      .sortedNeighborhood(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq == pairs.map(_.toSeq).toSeq)
  }

  // --------------------------------------------- s10 PQ ANN
  test("pq: codebooks deterministic, codes well-formed, nearest " +
    "assignment exact on a closed-form example") {
    import graft.queries.Similarity
    // closed-form nearest: centroid 1 is exactly x
    val cents = Array(Array(0f, 0f), Array(1f, 2f), Array(5f, 5f))
    assert(Similarity.pqNearest(Array(1f, 2f), cents) == 1)
    // tie (equidistant) → lowest index
    assert(Similarity.pqNearest(Array(3f, 3.5f),
      Array(Array(3f, 3f), Array(3f, 4f))) == 0)
    val emb = graft.queries.Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cb1 = Similarity.pqCodebooks(emb, seed = 11000)
    val cb2 = Similarity.pqCodebooks(emb, seed = 11000)
    assert(cb1.length == 8 && cb1.forall(_.length == 16))
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq,
      "training must be deterministic for a fixed seed")
    val v = emb.head().getSeq[Float](1)
    val code = Similarity.pqEncode(v, cb1)
    assert(code.length == 8 && code.forall(c => c >= 0 && c < 16))
  }

  // --------------------------------------------- st09 stream-static join
  test("stream-static enrichment: streaming join emits the identical " +
    "rows as the batch path") {
    val batchEvents = graft.queries.Streaming.events(spark, sfDir)
    val dim = graft.queries.Relational.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val batch = EventStreams.enrich(batchEvents, dim, "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
      .orderBy("event_id").collect()

    val microsDir = java.nio.file.Files.createTempDirectory("enrich-us")
    batchEvents.write.mode("overwrite").parquet(s"$microsDir/events")
    val stream = spark.readStream
      .schema(EventStreams.EventsSchema)
      .parquet(s"$microsDir/events")
    val q = EventStreams.enrich(stream, dim, "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrich_out")
      .orderBy("event_id").collect()
    assert(streamed.sameElements(batch),
      s"stream(${streamed.length}) != batch(${batch.length})")
  }
}
