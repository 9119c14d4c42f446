package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
import graft.pipeline.Embeddings

/**
 * Streaming EMBEDDING-cosine near-dup — the vector-modality member of
 * the streaming dedup family ([[StreamingDedup]] n-gram Jaccard,
 * [[StreamingExactDedup]] verbatim copies, [[StreamingSimhashDedup]]
 * hamming bands, [[StreamingMinhashDedup]] signature LSH, this
 * sign-bit hyperplane LSH over vectors). A trigger quantizes the
 * BATCH's vectors only (O(batch)), derives their sign-bit nibbles,
 * band-joins them against the maintained quantized index — the SAME
 * `writeQuantizedStore` frame the whole batch ANN family serves
 * queries from, so the stream and the ANN index share one state — and
 * exact-verifies candidates by in-row `qdot` cosine. The batch
 * restriction sits below the pair join; corpus raw embeddings are
 * never re-read by a trigger (plan-audited in PlanAuditSpec: the
 * plan's only file scan is the quantized store).
 *
 * State per corpus vector: the quantized vector itself (64 longs +
 * norm) for VERIFY, plus one wide sign fingerprint long (the
 * `<qvDir>_fp` sibling) for BANDING — the sf10 probe measured the
 * derive-fingerprints-per-trigger shape costing O(state × planes)
 * qdot projections (the trigger's actual linear term, 10.5→68 s per
 * 4× state at 32 planes), so band keys now come off an
 * 8-byte-per-vector columnar scan, the simhash-family profile. ONE
 * stored 64-plane fp serves both widths (planes 0-31 share formulas:
 * fp32 = fp64 & 0xFFFFFFFF), so the width knob never invalidates
 * state; a pre-fp-sibling store falls back to deriving (correct,
 * old cost) until [[compactState]] rebuilds the sibling. Appends are
 * per-vector rows; replayed batches (at-least-once restarts)
 * re-append byte-identical rows and [[compactState]]'s distinct
 * restores one row per vector. Survivor orientation and the
 * parquet-state discipline are [[StreamingDedup]]'s — see its header.
 *
 * WIDTH: `planes` defaults to [[PlanesAuto]] — the width is chosen
 * PER TRIGGER from the maintained fp store's row count (a
 * footer-metadata parquet count, no data scan): 32-plane / 4×8-bit
 * bands below [[AutoWideVectors]] (100k) stored vectors,
 * [[graft.pipeline.Embeddings.NumPlanesWide]] (64-plane / 4×16-bit)
 * above. The 32-bit banding's trigger cost is LINEAR in store size
 * (sf10 probe: 4.7× per 4× state at a 480k-vector store — 256-value
 * bands saturate, the simhash-32 shape), so a defaults-only
 * deployment previously inherited a measured scale cliff; auto-width
 * caps it at the wide mode's flat band occupancy. Unlike simhash,
 * widening is NOT free: sign-LSH banding is probabilistic and 16-bit
 * bands shift the match S-curve right (both widths' recall per
 * true-cosine bucket is MEASURED in PipelineSpec "band recall"; both
 * trigger costs are standing bench keys `stream_emb{,64}_trigger_*`)
 * — which is why the default keeps the higher-recall 32-plane
 * banding while the store is small, and why the threshold sits where
 * the probe located the cliff's onset, not at zero. Pin `planes`
 * explicitly to hold one width; the stored 64-plane fingerprints
 * serve BOTH widths (fp32 = fp64 & 0xFFFFFFFF), so the knob — and
 * the auto-switch as the store grows past the threshold — never
 * invalidates state. Deployments wanting zero banding-recall loss
 * run the SemDeDup centroid-blocked batch path
 * ([[graft.pipeline.Embeddings.dedupSemantic]], hot-cell capped) as
 * the periodic compaction-time sweep instead.
 */
object StreamingEmbeddingDedup {

  /** Sentinel `planes` value: resolve the banding width per trigger
   *  from the fp store's size (see the WIDTH scaladoc above). */
  val PlanesAuto: Int = 0

  /** Auto-width threshold: stores at or beyond this many vectors band
   *  at [[graft.pipeline.Embeddings.NumPlanesWide]]. Set where the
   *  sf10 probe measured the 32-bit banding's linear-in-state cost
   *  overtaking the wide mode (bench_sf10_r14/r15: 32-bit already
   *  4.7× at 480k; comparable at ~120k). */
  val AutoWideVectors: Long = 100000L

  /** Resolve [[PlanesAuto]] against the maintained state: the fp
   *  sibling's row count when it exists (8 B/vector frame, and the
   *  count is answered from parquet footers — no data scan), else the
   *  quantized store's, else 0 (cold start → narrow). A pinned
   *  `planes > 0` passes through untouched. */
  private def resolvePlanes(spark: SparkSession, planes: Int,
                            qvDir: String, fpDir: String,
                            autoWideAt: Long): Int =
    if (planes > 0) planes
    else {
      val hconf = spark.sparkContext.hadoopConfiguration
      def countIf(dir: String, schema: StructType): Option[Long] = {
        val p = new Path(dir)
        if (p.getFileSystem(hconf).exists(p))
          Some(spark.read.schema(schema).parquet(dir).count())
        else None
      }
      val stored = countIf(fpDir, fpSchema)
        .orElse(countIf(qvDir, qvSchema)).getOrElse(0L)
      if (stored >= autoWideAt) Embeddings.NumPlanesWide
      else Embeddings.NumPlanes
    }

  private val qvSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("qarr", ArrayType(LongType)),
    StructField("nq", LongType)))

  private val fpSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("fp", LongType)))

  private def readOrEmpty(spark: SparkSession, dir: String,
                          schema: StructType): DataFrame = {
    val p = new Path(dir)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The near-dup pair frame for one micro-batch, built ONLY from the
   *  maintained quantized index + the batch itself — corpus embeddings
   *  are not an input (audited in PlanAuditSpec: the plan's only file
   *  scan is the quantized store). */
  def triggerPairs(spark: SparkSession, batch: DataFrame, qvDir: String,
                   minCosine: Double,
                   planes: Int = PlanesAuto,
                   fpDir: String = null,
                   autoWideAt: Long = AutoWideVectors): DataFrame = {
    val resolvedPlanes = resolvePlanes(spark, planes, qvDir,
      Option(fpDir).getOrElse(qvDir + "_fp"), autoWideAt)
    // Banding side: the maintained fp store (8 B/vector scan) when it
    // exists; a store created before the fp sibling landed falls back
    // to deriving fingerprints from the quantized rows — correct at
    // the measured O(state x planes) cost — until compactState (which
    // rebuilds the sibling) or the next seeded restart.
    val fps = Option(fpDir).filter { d =>
      val pth = new Path(d)
      pth.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(pth)
    }.map(d => spark.read.schema(fpSchema).parquet(d))
    Embeddings.dedupEmbeddingIncremental(
      batch.limit(0), batch, minCosine,
      corpusQuantized = Some(readOrEmpty(spark, qvDir, qvSchema)),
      planes = resolvedPlanes,
      corpusFingerprints = fps)
  }

  /** One micro-batch: detect pairs, append the surviving raw vectors
   *  to the corpus store and their quantized rows to the index store.
   *  Both appends are O(batch). */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
                   pairsDir: String, qvDir: String,
                   minCosine: Double,
                   planes: Int = PlanesAuto,
                   fpDir: String = null,
                   autoWideAt: Long = AutoWideVectors): Unit = {
    val spark = batch.sparkSession
    val dir = Option(fpDir).getOrElse(qvDir + "_fp")
    val b = batch.select("vec_id", "embedding")
    val pairs = triggerPairs(spark, b, qvDir, minCosine, planes, dir,
      autoWideAt).cache()
    // r17 (guide §2.6 via StateWrites): the pairs append is
    // independent of the survivor chain once the pair cache is
    // filled. The qv and fp appends previously EACH quantized the
    // survivors (embFingerprints = signFp ∘ quantized) — the fp
    // append now derives from the same survivor-quantized frame
    // (embFingerprintsFromQuantized, bit-identical by definition),
    // and the three survivor-side appends run overlapped against the
    // materialized caches.
    pairs.count()
    // Same orientation-blind rule as StreamingDedup: vec_b of any pair
    // drops; vec_a drops only when its partner is a corpus vector.
    val batchIds = b.select("vec_id")
    val dropAsA = pairs
      .join(batchIds.withColumnRenamed("vec_id", "vec_b"), Seq("vec_b"), "left_anti")
      .select(col("vec_a").as("vec_id"))
    val dupIds = pairs.select(col("vec_b").as("vec_id"))
      .union(dropAsA).distinct()
    val survivors = b.join(dupIds, Seq("vec_id"), "left_anti").cache()
    val survQv = Embeddings.quantizedIndex(survivors).cache()
    StateWrites.overlap(
      () => pairs.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(pairsDir),
      () => {
        survivors.count()
        survQv.count()
        StateWrites.overlap(
          () => survivors.write.mode("append").parquet(storeDir),
          () => survQv.write.mode("append").parquet(qvDir),
          () => Embeddings.embFingerprintsFromQuantized(survQv)
            .write.mode("append").parquet(dir))
      })
    survQv.unpersist()
    survivors.unpersist()
    pairs.unpersist()
  }

  /** Offline state maintenance between stream restarts: replayed
   *  batches append byte-identical (vec_id, qarr, nq) rows, so
   *  compaction is distinct + rewrite via the same crash-safe
   *  tmp-write + rename-swap as [[StreamingDedup.compactState]]. The
   *  fp sibling is REBUILT from the compacted quantized rows (also
   *  the migration path that materializes it for a pre-fp-store
   *  deployment). */
  def compactState(spark: SparkSession, storeDir: String,
                   qvDir: String = null, partitions: Int = 32): Unit = {
    val dir = Option(qvDir).getOrElse(storeDir + "_qv")
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new Path(dir)
    val fs = path.getFileSystem(hconf)
    if (!fs.exists(path)) return
    def swapIn(target: Path, write: String => Unit): Unit = {
      val tmp = new Path(target + ".compact-tmp")
      val old = new Path(target + ".compact-old")
      write(tmp.toString)
      fs.delete(old, true)
      if (fs.exists(target) && !fs.rename(target, old))
        throw new java.io.IOException(s"compactState: cannot move $target aside")
      if (!fs.rename(tmp, target)) {
        fs.rename(old, target) // roll back
        throw new java.io.IOException(s"compactState: cannot install $tmp")
      }
      fs.delete(old, true)
    }
    swapIn(path, t => spark.read.schema(qvSchema).parquet(dir)
      .distinct().repartition(partitions).write.parquet(t))
    swapIn(new Path(dir + "_fp"), t =>
      Embeddings.embFingerprintsFromQuantized(
          spark.read.schema(qvSchema).parquet(dir))
        .repartition(partitions).write.parquet(t))
  }

  /** Start the loop over a streaming embeddings frame (schema must
   *  include `vec_id` and `embedding: array<float>`). The quantized
   *  index store defaults to a sibling of `storeDir`. */
  def dedupedVecStream(vecs: DataFrame, storeDir: String, pairsDir: String,
                       checkpoint: String, minCosine: Double = 0.4,
                       qvDir: String = null,
                       planes: Int = PlanesAuto): StreamingQuery = {
    val dir = Option(qvDir).getOrElse(storeDir + "_qv")
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, pairsDir, dir, minCosine,
          planes)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
