package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata. */
case class MultimodalRecord(
    doc_id: Long, modality: String, payload: Array[Byte],
    byte_len: Long, declared_width: Long, declared_height: Long)

/** Stub "decoded" features — deterministic functions of the payload so
  * the distributed plumbing is fully testable without codec libraries. */
case class MultimodalFeatures(
    doc_id: Long, modality: String, byte_len: Long,
    frame_count: Long, mean_byte: Long, feature_crc: Long)

/** One sampled "frame": a fixed-size byte window of a video payload. */
case class FrameSample(
    doc_id: Long, frame_idx: Long, frame_len: Long, frame_crc: Long)

/**
 * Multimodal-column plumbing for an LLM data pipeline: treat
 * image/audio/video as opaque `binary` columns with typed metadata, and
 * run decode/feature-extraction as a partition-local pipeline stage.
 *
 * The decode step is STUBBED (this environment has no codec libraries):
 * `decodeStub` computes deterministic pseudo-features from the raw
 * bytes. The Spark-side shape is the real thing — a typed
 * `Dataset[MultimodalRecord]`, `mapPartitions` batch processing (the
 * Scala analogue of `mapInPandas`: one iterator per partition, so a
 * real decoder would amortise model/codec init per partition, not per
 * row), and binary payloads that are never shuffled (features are
 * extracted before any aggregation).
 */
object Multimodal {

  /** Synthesise binary payloads from the documents table (UTF-8 bytes
   *  stand in for media blobs) + deterministic metadata. */
  def asBinary(docs: DataFrame): Dataset[MultimodalRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"),
        (lit(64L) + (col("doc_id") % 16) * 32L).as("declared_width"),
        (lit(64L) + (col("doc_id") % 8) * 32L).as("declared_height"))
      .as[MultimodalRecord]
  }

  /** Partition-local "decode": one pass over the payload bytes.
   *  ??? in a real deployment this is the codec call (e.g. JPEG decode
   *  + CNN features); here it is a deterministic fake with the same
   *  batch shape. */
  def decodeStub(records: Iterator[MultimodalRecord]): Iterator[MultimodalFeatures] =
    records.map { r =>
      var sum = 0L
      var crc = 17L
      var i = 0
      while (i < r.payload.length) {
        val b = r.payload(i) & 0xff
        sum += b
        crc = (crc * 31 + b) % 1000003L
        i += 1
      }
      MultimodalFeatures(
        doc_id = r.doc_id,
        modality = r.modality,
        byte_len = r.byte_len,
        frame_count = r.byte_len / 1024L + 1L,
        mean_byte = if (r.payload.length == 0) 0L else sum / r.payload.length,
        feature_crc = crc)
    }

  /** Full pipeline: binary plumbing -> partition-local decode ->
   *  per-modality ordering. */
  def multimodalFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs)
      .mapPartitions(decodeStub)
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame sampling over video payloads: every `stride`-th
   *  `frameBytes`-sized window, one output row per sampled frame.
   *  Frames are cut partition-locally inside the same `mapPartitions`
   *  stage that holds the payload — the row explosion happens BEFORE
   *  any shuffle, and only the (small) per-frame features ever move.
   *  ??? the frame-boundary scan is where a real container demuxer
   *  (keyframe index) plugs in; the fixed-window cut is the stub. */
  def frameSample(docs: DataFrame, frameBytes: Int = 1024,
                  stride: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).filter(_.modality == "video").mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val start = f * frameBytes
          val end = math.min(start + frameBytes, r.payload.length)
          var crc = 17L
          var i = start
          while (i < end) {
            crc = (crc * 31 + (r.payload(i) & 0xff)) % 1000003L
            i += 1
          }
          FrameSample(r.doc_id, f.toLong, (end - start).toLong, crc)
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  /** [[frameSample]] with 64-byte frames / stride 2 — the harness
   *  parameters that exercise multi-frame docs on the synthetic
   *  corpus. ASCII text means DuckDB can mirror the byte windows with
   *  substr + the same rolling hash. */
  val frameSampleOracle: String = """
WITH v AS (
  SELECT doc_id, text, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT doc_id,
         unnest(range(0, CAST((byte_len + 63) // 64 AS INTEGER), 2)) AS frame_idx
  FROM v),
s AS (
  SELECT f.doc_id, f.frame_idx,
         substr(v.text, CAST(f.frame_idx * 64 + 1 AS INTEGER), 64) AS chunk
  FROM f JOIN v ON f.doc_id = v.doc_id)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(length(chunk) AS BIGINT) AS frame_len,
       CAST(list_reduce(list_prepend(CAST(17 AS BIGINT),
              list_transform(range(1, length(chunk) + 1),
                i -> CAST(ascii(substr(chunk, i, 1)) AS BIGINT))),
            (acc, x) -> (acc * 31 + x) % 1000003) AS BIGINT) AS frame_crc
FROM s
ORDER BY doc_id, frame_idx"""

  /** Cross-video repeated-frame detection — the intro/outro/title-card
   *  dedup primitive a video pipeline runs before paying encode or
   *  embedding cost on redundant frames: fingerprint-identical frames
   *  appearing in >= `minDocs` distinct documents, with their doc and
   *  occurrence mass. Grouping is BY FINGERPRINT (crc + length), the
   *  same contract a production pipeline has with a strong frame
   *  hash; payload bytes never shuffle — the per-frame features are
   *  extracted partition-locally by [[frameSample]] and only (crc,
   *  len, doc_id) rows reach the exchange. */
  def frameDedup(docs: DataFrame, frameBytes: Int = 1024, stride: Int = 2,
                 minDocs: Long = 2L): DataFrame =
    frameSample(docs, frameBytes, stride)
      .groupBy("frame_crc", "frame_len")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_frames"))
      .filter(col("n_docs") >= minDocs)
      .orderBy("frame_crc", "frame_len")

  /** Wraps [[frameSampleOracle]]'s chain (same 64-byte harness
   *  frames) in the fingerprint group-by. */
  val frameDedupOracle: String =
    "WITH fs AS (" + frameSampleOracle + """)
SELECT frame_crc, frame_len,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM fs
GROUP BY frame_crc, frame_len
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY frame_crc, frame_len"""

  /** The stub features are pure integer functions of the UTF-8 bytes,
   *  so DuckDB reproduces them: mean_byte is the mean code unit (docs
   *  are ASCII, so code units == bytes) and feature_crc is the rolling
   *  polynomial hash expressed as a list_reduce. */
  val multimodalFeaturesOracle: String = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
         text
  FROM documents)
SELECT doc_id, modality, byte_len,
       byte_len // 1024 + 1 AS frame_count,
       CASE WHEN byte_len = 0 THEN 0
            ELSE CAST(list_sum(list_transform(range(1, CAST(byte_len AS INTEGER) + 1),
                   i -> ascii(substr(text, i, 1)))) AS BIGINT) // byte_len END AS mean_byte,
       CAST(list_reduce(list_prepend(CAST(17 AS BIGINT),
              list_transform(range(1, CAST(byte_len AS INTEGER) + 1),
                i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
            (acc, x) -> (acc * 31 + x) % 1000003) AS BIGINT) AS feature_crc
FROM b
ORDER BY doc_id"""
}
