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
