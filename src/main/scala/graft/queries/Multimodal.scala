package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Multimodal-column plumbing for training-data pipelines (Layer B
  * north-star; absent in the reference). Media payloads are opaque
  * `binary` columns with typed metadata travelling beside them; decode/
  * feature-extraction runs as batched partition-level processing
  * (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas`), so one task amortizes per-batch setup (codec init,
  * model load) across its whole partition, which is the shape that
  * matters at 100 TB.
  *
  * The actual codec is STUBBED: this container has no image/audio
  * libraries, so `decodeStub` produces deterministic fake features from
  * the bytes. The Spark-side plumbing — schema, batching, partitioning,
  * column layout — is real and tested; swap `decodeStub` for a real
  * decoder to productionize. */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], fmt: String,
                      n_bytes: Long)
  case class MediaFeatures(doc_id: Long, fmt: String, n_bytes: Long,
                           feature: Array[Float])

  /** ===== STUB ===== deterministic fake "decoder": 8 pseudo-features
    * from the byte content. Replace with a real codec (JPEG decode,
    * mel spectrogram, …) in production. */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < 8) {
      val h = MurmurHash3.bytesHash(media, i)
      out(i) = (h & 0xffff).toFloat / 0xffff
      i += 1
    }
    out
  }

  /** documents → media table: text bytes as the opaque payload. In a
    * real pipeline this is `spark.read.format("binaryFile")` or a
    * parquet table with a binary column. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Relational.table(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        lit("text/plain").as("fmt"),
        octet_length(encode(col("text"), "UTF-8")).cast("long")
          .as("n_bytes"))

  /** Metadata-only projection (oracle-checkable). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(col("doc_id"), col("fmt"), col("n_bytes"))
      .orderBy("doc_id")

  val mediaMetaSql: String = """
    SELECT doc_id, 'text/plain' AS fmt,
      octet_length(encode(text)) AS n_bytes
    FROM documents
    ORDER BY doc_id"""

  /** Batched decode/feature-extract over partitions. Output: one
    * feature vector per media item plus carried metadata. */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = mediaTable(s, dir).as[MediaRow]
    ds.mapPartitions { rows =>
      // per-partition setup happens once here (codec/model init stub)
      rows.map { r =>
        MediaFeatures(r.doc_id, r.fmt, r.n_bytes, decodeStub(r.media))
      }
    }.toDF()
      .select(col("doc_id"), col("fmt"), col("n_bytes"),
        round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
        round(element_at(col("feature"), 2).cast("double"), 4).as("f1"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------- frame sampling
  private val FrameBytes = 64
  private val FrameStride = 4

  /** Frame sampling over the opaque binary payload: fixed-size byte
    * frames, every `FrameStride`-th kept (the video-pipeline shape:
    * chunk → sample → per-frame feature). Pure expressions — the
    * explode fans out only the sampled frame indices, never the
    * payload bytes per frame candidate; `substring` on the binary
    * column slices lazily per emitted row. */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    val nFrames = ceil(col("n_bytes") / lit(FrameBytes.toDouble)).cast("long")
    mediaTable(s, dir)
      // zero-byte payloads have no frames: sequence(0, -1) would throw,
      // and the oracle's range(0, 0, k) emits nothing for them
      .filter(col("n_bytes") > 0)
      .withColumn("frame_no",
        explode(sequence(lit(0L), nFrames - 1, lit(FrameStride.toLong))))
      .withColumn("frame",
        expr(s"substring(media, cast(frame_no * $FrameBytes + 1 as int), " +
          s"$FrameBytes)"))
      .select(col("doc_id"), col("frame_no"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_no")
  }

  /** DuckDB oracle: the corpus is pure ASCII (verified), so character
    * substrings of the text equal byte slices of the payload and
    * VARCHAR md5 equals Spark's binary md5. */
  val frameSampleSql: String = s"""
    SELECT doc_id, frame_no,
      octet_length(encode(substring(text,
        CAST(frame_no * $FrameBytes + 1 AS BIGINT), $FrameBytes)))
        AS frame_bytes,
      md5(substring(text,
        CAST(frame_no * $FrameBytes + 1 AS BIGINT), $FrameBytes))
        AS frame_md5
    FROM (
      SELECT doc_id, text,
        unnest(range(0,
          CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT),
          $FrameStride)) AS frame_no
      FROM documents)
    ORDER BY doc_id, frame_no"""

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("mm01_media_meta", mediaMeta _, Some(mediaMetaSql)),
      ("mm02_media_features", mediaFeatures _, None),
      ("mm03_frame_sample", frameSample _, Some(frameSampleSql)),
    )
}
