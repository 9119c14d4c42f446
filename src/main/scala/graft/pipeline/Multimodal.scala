package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Round.r4

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
    // null text -> empty payload: a corpus-scale table WILL contain
    // null rows, and a null byte_len violates the record's
    // non-nullable Long (crashes the whole pipeline stage)
    docs.select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
        octet_length(encode(coalesce(col("text"), lit("")), "UTF-8"))
          .cast("long").as("byte_len"),
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
  SELECT doc_id, text, CAST(octet_length(CAST(COALESCE(text, '') AS BLOB)) AS BIGINT) AS byte_len
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

  /** One sampled frame's perceptual fingerprint: the aHash bands.
   *  `fid` packs (doc_id, frame_idx) into one join key for the
   *  generic bucket-pair machinery. */
  case class FrameAhash(doc_id: Long, frame_idx: Long, fid: Long,
      b0: Long, b1: Long, b2: Long, b3: Long,
      b4: Long, b5: Long, b6: Long, b7: Long)

  private val FidShift = 1048576L // frame_idx < 2^20 at any sane payload size

  /** aHash-style 64-bit perceptual fingerprints per sampled frame,
   *  emitted as 8 one-byte bands. The classic aHash recipe (resize
   *  to 8x8 grayscale, threshold each pixel against the mean) maps
   *  onto the decode stub's deterministic bytes: 64 pixels sampled
   *  at `start + i*len/64` across the frame window (the "resize"),
   *  thresholded by the integer-exact cross-multiplication
   *  `px*64 > sum(px)` (no division, no floats — the oracle mirrors
   *  it verbatim). The pixel read is the `???`-marked stub-decode
   *  boundary (see the file header): a real decoder's luma plane
   *  plugs in there; everything downstream of the byte access is the
   *  real pipeline. Computed inside the SAME partition-local
   *  pass that holds the payload ([[frameSample]] discipline):
   *  payload bytes never reach an exchange — only the 8 band bytes
   *  per frame do. */
  def frameFingerprints(docs: DataFrame, frameBytes: Int = 1024,
                        stride: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).filter(_.modality == "video").mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val start = f * frameBytes
          val end = math.min(start + frameBytes, r.payload.length)
          val flen = end - start
          val px = new Array[Long](64)
          var i = 0
          var sum = 0L
          while (i < 64) {
            px(i) = r.payload(start + (i * flen) / 64) & 0xff
            sum += px(i)
            i += 1
          }
          val bands = new Array[Long](8)
          i = 0
          while (i < 64) {
            if (px(i) * 64 > sum) bands(i / 8) |= 1L << (i % 8)
            i += 1
          }
          FrameAhash(r.doc_id, f.toLong, r.doc_id * FidShift + f,
            bands(0), bands(1), bands(2), bands(3),
            bands(4), bands(5), bands(6), bands(7))
        }
      }
    }.toDF()
  }

  /** Cross-video PERCEPTUAL frame near-dup — the re-encoded-intro
   *  detector [[frameDedup]]'s exact CRC grouping cannot be: frames
   *  whose aHash fingerprints are within `maxHamming` bits count as
   *  the same visual content even when their bytes differ. Blocking
   *  is the SimHash band pigeonhole over FOUR 16-BIT bands (adjacent
   *  byte-band pairs packed `b2j + b2j+1·256`): hamming <= 3 over 64
   *  bits can corrupt at most 3 of 4 disjoint wide bands, so one
   *  stays equal — same exactness as the original 8×8-bit split but
   *  65536 bucket values per band instead of 256. That selectivity
   *  is what survives a scale-up: aHash bands over low-entropy
   *  payloads collide heavily at 8 bits, and the 10× stress corpus
   *  measured the byte-band candidate join going quadratic (408 s at
   *  sf1 vs 5.9 s at sf0.1) while the wide-band split stays
   *  candidate-bounded. Same-video pairs (temporal redundancy, not
   *  dedup) are cut BEFORE the verify joins — a projection-level
   *  `fid div 2^20` comparison on the candidate frame, so adjacent-
   *  frame self-similarity never reaches an exchange. The exact
   *  hamming verify is an 8-term xor/bit_count projection over the
   *  surviving candidates only. */
  def frameDedupNear(docs: DataFrame, frameBytes: Int = 1024,
                     stride: Int = 2, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-band pigeonhole blocking is exact only for maxHamming <= 3, got $maxHamming")
    val fps = frameFingerprints(docs, frameBytes, stride).cache()
    val bandCols = (0 to 7).map(j => col(s"b$j"))
    val bands = fps.select(col("fid"),
        explode(expr("array(" +
          (0 to 3).map(j => s"struct(${j}L AS band, b${2 * j} + b${2 * j + 1} * 256L AS bsig)")
            .mkString(",") + ")")).as("nb"))
      .select(col("fid"), col("nb.band").as("band"), col("nb.bsig").as("bsig"))
    val cands = Dedup.saltedBucketPairs(bands, Seq("band", "bsig"), "fid")
      .select(col("doc_a").as("fid_a"), col("doc_b").as("fid_b"))
      // cross-document only, cut before the two fingerprint joins
      .filter(expr(s"fid_a div $FidShift") =!= expr(s"fid_b div $FidShift"))
    def side(suffix: String) = fps.select(
      col("fid").as(s"fid_$suffix") +: bandCols.map(c =>
        c.as(s"${c.toString}_$suffix")): _*)
    val ham = (0 to 7).map(j =>
      bit_count(col(s"b${j}_a").bitwiseXOR(col(s"b${j}_b"))).cast("long"))
      .reduce(_ + _)
    cands.join(side("a"), "fid_a").join(side("b"), "fid_b")
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select(expr(s"fid_a div $FidShift").as("doc_a"),
        pmod(col("fid_a"), lit(FidShift)).as("frame_a"),
        expr(s"fid_b div $FidShift").as("doc_b"),
        pmod(col("fid_b"), lit(FidShift)).as("frame_b"),
        col("hamming"))
      .orderBy("doc_a", "frame_a", "doc_b", "frame_b")
  }

  /** The same chain over the 64-byte harness frames: pixel sampling
   *  by the identical `i*len/64` index, the identical cross-
   *  multiplied threshold, band packing, a band-equality self-join
   *  for candidates, and the 8-term xor/bit_count hamming. */
  val frameDedupNearOracle: String = """
WITH v AS (
  SELECT doc_id, text, CAST(octet_length(CAST(COALESCE(text, '') AS BLOB)) AS BIGINT) AS byte_len
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT doc_id,
         unnest(range(0, CAST((byte_len + 63) // 64 AS INTEGER), 2)) AS frame_idx
  FROM v),
s AS (
  SELECT f.doc_id, f.frame_idx,
         substr(v.text, CAST(f.frame_idx * 64 + 1 AS INTEGER), 64) AS chunk
  FROM f JOIN v ON f.doc_id = v.doc_id),
px AS (
  SELECT doc_id, frame_idx, i,
         CAST(ascii(substr(chunk,
           CAST((i * length(chunk)) // 64 AS INTEGER) + 1, 1)) AS BIGINT) AS px
  FROM s, unnest(range(0, 64)) AS g(i)
  WHERE length(chunk) > 0),
tot AS (
  SELECT doc_id, frame_idx, CAST(SUM(px) AS BIGINT) AS psum
  FROM px GROUP BY doc_id, frame_idx),
bits AS (
  SELECT p.doc_id, p.frame_idx, p.i,
         CASE WHEN p.px * 64 > t.psum THEN 1 ELSE 0 END AS bit
  FROM px p JOIN tot t ON p.doc_id = t.doc_id AND p.frame_idx = t.frame_idx),
bands AS (
  SELECT doc_id, frame_idx, CAST(i // 8 AS BIGINT) AS band,
         CAST(SUM(bit * (1 << (CAST(i AS INTEGER) % 8))) AS BIGINT) AS bval
  FROM bits GROUP BY doc_id, frame_idx, i // 8),
wide AS (
  SELECT doc_id, frame_idx,
         MAX(CASE WHEN band = 0 THEN bval END) AS b0,
         MAX(CASE WHEN band = 1 THEN bval END) AS b1,
         MAX(CASE WHEN band = 2 THEN bval END) AS b2,
         MAX(CASE WHEN band = 3 THEN bval END) AS b3,
         MAX(CASE WHEN band = 4 THEN bval END) AS b4,
         MAX(CASE WHEN band = 5 THEN bval END) AS b5,
         MAX(CASE WHEN band = 6 THEN bval END) AS b6,
         MAX(CASE WHEN band = 7 THEN bval END) AS b7
  FROM bands GROUP BY doc_id, frame_idx),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, a.frame_idx AS frame_a,
                  b.doc_id AS doc_b, b.frame_idx AS frame_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bval = b.bval
   AND a.doc_id * 1048576 + a.frame_idx < b.doc_id * 1048576 + b.frame_idx
  WHERE a.doc_id <> b.doc_id),
ham AS (
  SELECT c.doc_a, c.frame_a, c.doc_b, c.frame_b,
         CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
            + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
            + bit_count(xor(wa.b4, wb.b4)) + bit_count(xor(wa.b5, wb.b5))
            + bit_count(xor(wa.b6, wb.b6)) + bit_count(xor(wa.b7, wb.b7))
           AS BIGINT) AS hamming
  FROM cand c
  JOIN wide wa ON wa.doc_id = c.doc_a AND wa.frame_idx = c.frame_a
  JOIN wide wb ON wb.doc_id = c.doc_b AND wb.frame_idx = c.frame_b)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(frame_a AS BIGINT) AS frame_a,
       CAST(doc_b AS BIGINT) AS doc_b, CAST(frame_b AS BIGINT) AS frame_b,
       hamming
FROM ham WHERE hamming <= 3
ORDER BY doc_a, frame_a, doc_b, frame_b"""

  /** Media-payload QA gate — the schema-level sanity pass a
   *  multimodal pipeline runs BEFORE paying decode cost: per
   *  modality, empty payloads (truncated uploads), payloads too
   *  small for their declared dimensions (the classic corrupt-file
   *  signature — a WxH image can't honestly fit in WxH/`minBitsPerPx`
   *  bits), byte-length extremes and mass. Catches the feed that
   *  started shipping thumbnails under full-size metadata without
   *  opening a single codec. Pure row projection over the typed
   *  binary records + one |modalities|-row aggregate; payloads never
   *  shuffle. */
  def mediaQa(docs: DataFrame, minBitsPerPx: Long = 8L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).toDF()
      .select(col("modality"), col("byte_len"),
        col("declared_width"), col("declared_height"),
        (col("byte_len") === 0L).cast("long").as("is_empty"),
        (col("byte_len") > 0L && col("byte_len") * lit(8L)
          < col("declared_width") * col("declared_height") * lit(minBitsPerPx))
          .cast("long").as("is_undersized"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n_docs"),
        sum("is_empty").as("n_empty"),
        sum("is_undersized").as("n_undersized"),
        min("byte_len").as("min_bytes"),
        max("byte_len").as("max_bytes"),
        sum("byte_len").as("total_bytes"))
      .select(col("modality"), col("n_docs"), col("n_empty"),
        col("n_undersized"), col("min_bytes"), col("max_bytes"),
        col("total_bytes"),
        r4((col("n_empty") + col("n_undersized")) * lit(1.0) / col("n_docs"))
          .as("flagged_frac"))
      .orderBy("modality")
  }

  val mediaQaOracle: String = """
WITH b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(CAST(COALESCE(text, '') AS BLOB)) AS BIGINT) AS byte_len,
         64 + (doc_id % 16) * 32 AS declared_width,
         64 + (doc_id % 8) * 32 AS declared_height
  FROM documents),
fl AS (
  SELECT modality, byte_len,
         CASE WHEN byte_len = 0 THEN 1 ELSE 0 END AS is_empty,
         CASE WHEN byte_len > 0 AND byte_len * 8 < declared_width * declared_height * 8
              THEN 1 ELSE 0 END AS is_undersized
  FROM b)
SELECT modality, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_empty) AS BIGINT) AS n_empty,
       CAST(SUM(is_undersized) AS BIGINT) AS n_undersized,
       CAST(MIN(byte_len) AS BIGINT) AS min_bytes,
       CAST(MAX(byte_len) AS BIGINT) AS max_bytes,
       CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
       FLOOR(((SUM(is_empty) + SUM(is_undersized)) * 1.0 / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS flagged_frac
FROM fl GROUP BY modality ORDER BY modality"""

  /** SCENE-CUT detection per video — the shot-boundary pass a video
   *  curation pipeline runs to pick representative frames and to
   *  price per-shot embedding cost: adjacent SAMPLED frames' aHash
   *  hamming distance, a "cut" where the distance clears
   *  `cutHamming` bits (a hard scene change flips a large share of
   *  the 64 threshold bits; temporal continuity keeps it low). Per
   *  video: frames, transitions, cuts, mean/max adjacent distance —
   *  the within-video TEMPORAL readout next to [[frameDedupNear]]'s
   *  cross-video matcher (which deliberately cuts same-video pairs).
   *
   *  Shape: fingerprints come from the same partition-local pass
   *  ([[frameFingerprints]] — payload bytes never shuffle); the
   *  adjacent pairing is a lag window partitioned BY VIDEO (each
   *  partition holds one video's ≤2^20 frame rows, nothing
   *  corpus-wide); the rollup is one partial agg to |videos| rows.
   *  The 8 byte-bands pack into two 32-bit halves so the lag carries
   *  2 longs, not 8 (64-bit packing would overflow the sign bit at
   *  b7 ≥ 128). Hamming sums/maxes are exact integers; the one
   *  division is the final r4 mean. */
  def sceneCuts(docs: DataFrame, frameBytes: Int = 1024, stride: Int = 2,
                cutHamming: Int = 24): DataFrame = {
    val fps = frameFingerprints(docs, frameBytes, stride)
      .select(col("doc_id"), col("frame_idx"),
        (col("b0") + col("b1") * 256L + col("b2") * 65536L
          + col("b3") * 16777216L).as("lo"),
        (col("b4") + col("b5") * 256L + col("b6") * 65536L
          + col("b7") * 16777216L).as("hi"))
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val adj = fps
      .withColumn("plo", lag("lo", 1).over(w))
      .withColumn("phi", lag("hi", 1).over(w))
      .withColumn("hamming",
        when(col("plo").isNull, lit(null)).otherwise(
          bit_count(col("lo").bitwiseXOR(col("plo"))).cast("long")
            + bit_count(col("hi").bitwiseXOR(col("phi"))).cast("long")))
    adj.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        count(col("hamming")).as("n_transitions"),
        sum(when(col("hamming") >= cutHamming, 1L).otherwise(0L)).as("n_cuts"),
        sum("hamming").as("ham_sum"),
        max("hamming").as("max_hamming"))
      .select(col("doc_id"), col("n_frames"), col("n_transitions"),
        col("n_cuts"),
        when(col("n_transitions") === 0L, lit(0.0))
          .otherwise(r4(col("ham_sum") * lit(1.0) / col("n_transitions")))
          .as("mean_hamming"),
        coalesce(col("max_hamming"), lit(0L)).as("max_hamming"))
      .orderBy("doc_id")
  }

  /** [[frameDedupNearOracle]]'s px/threshold chain to per-(frame, i)
   *  bits, then adjacent frames join on `frame_idx + 2` (the harness
   *  stride) and hamming = SUM(bit_a <> bit_b) — arithmetically the
   *  same xor/bit_count the Spark side computes over packed halves. */
  val sceneCutsOracle: String = """
WITH v AS (
  SELECT doc_id, text, CAST(octet_length(CAST(COALESCE(text, '') AS BLOB)) AS BIGINT) AS byte_len
  FROM documents WHERE doc_id % 3 = 2),
f AS (
  SELECT doc_id,
         unnest(range(0, CAST((byte_len + 63) // 64 AS INTEGER), 2)) AS frame_idx
  FROM v),
s AS (
  SELECT f.doc_id, f.frame_idx,
         substr(v.text, CAST(f.frame_idx * 64 + 1 AS INTEGER), 64) AS chunk
  FROM f JOIN v ON f.doc_id = v.doc_id),
px AS (
  SELECT doc_id, frame_idx, i,
         CAST(ascii(substr(chunk,
           CAST((i * length(chunk)) // 64 AS INTEGER) + 1, 1)) AS BIGINT) AS px
  FROM s, unnest(range(0, 64)) AS g(i)
  WHERE length(chunk) > 0),
tot AS (
  SELECT doc_id, frame_idx, CAST(SUM(px) AS BIGINT) AS psum
  FROM px GROUP BY doc_id, frame_idx),
bits AS (
  SELECT p.doc_id, p.frame_idx, p.i,
         CASE WHEN p.px * 64 > t.psum THEN 1 ELSE 0 END AS bit
  FROM px p JOIN tot t ON p.doc_id = t.doc_id AND p.frame_idx = t.frame_idx),
adj AS (
  SELECT a.doc_id, a.frame_idx,
         CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
  FROM bits a JOIN bits b
    ON a.doc_id = b.doc_id AND b.frame_idx = a.frame_idx + 2 AND a.i = b.i
  GROUP BY a.doc_id, a.frame_idx),
nf AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames
  FROM s GROUP BY doc_id),
roll AS (
  SELECT n.doc_id, n.n_frames,
         CAST(COUNT(a.hamming) AS BIGINT) AS n_transitions,
         CAST(COALESCE(SUM(CASE WHEN a.hamming >= 24 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cuts,
         CAST(COALESCE(SUM(a.hamming), 0) AS BIGINT) AS ham_sum,
         CAST(COALESCE(MAX(a.hamming), 0) AS BIGINT) AS max_hamming
  FROM nf n LEFT JOIN adj a ON n.doc_id = a.doc_id
  GROUP BY n.doc_id, n.n_frames)
SELECT doc_id, n_frames, n_transitions, n_cuts,
       CASE WHEN n_transitions = 0 THEN 0.0
            ELSE FLOOR((ham_sum * 1.0 / n_transitions) * 10000.0 + 0.5) / 10000.0
       END AS mean_hamming,
       max_hamming
FROM roll ORDER BY doc_id"""

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
         CAST(octet_length(CAST(COALESCE(text, '') AS BLOB)) AS BIGINT) AS byte_len,
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
