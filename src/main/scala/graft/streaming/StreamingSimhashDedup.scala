package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.pipeline.Dedup

/**
 * Streaming SimHash near-dup dedup — the cheapest-state member of the
 * streaming dedup family ([[StreamingDedup]] = n-gram Jaccard over a
 * shingle + gram-df store, [[StreamingExactDedup]] = verbatim copies
 * over a bloom + hash store, this = hamming-ball near-dups over ONE
 * fingerprint store). SimHash verification needs only the fingerprints
 * themselves, so the per-doc state is a single (doc_id, fp) long — no
 * shingle rows, no df deltas, nothing to fold at read time. A trigger
 * reads the fp store (8 bytes/doc — ~800 MB state per 100M docs, a
 * columnar scan, not executor memory), fingerprints the BATCH only,
 * and band-joins batch nibbles against store+batch nibbles with the
 * batch restriction below the pair join — per-trigger compute is
 * O(batch), the only O(corpus) term is the store scan.
 *
 * Survivor rule, replay tolerance (at-least-once restarts re-derive
 * the same verdicts; re-appended rows are exact duplicates, folded by
 * [[compactState]]'s distinct), and the parquet-state discipline are
 * [[StreamingDedup]]'s — see its header for the contract.
 *
 * DEFAULT width is [[Dedup.SimBitsWide]] (64-bit fingerprints, 4
 * 16-bit bands): the sf10 probe (bench_sf10_r14) measured the 32-bit
 * width's trigger LINEAR in store size (4×256 band keys saturate —
 * 58.7 s vs 6.3 s wide at a 480k-doc store), so the maintained-store
 * surface must not ship the cliff as its default. The batch
 * `dedup_simhash*` entrypoints keep the 32-bit default (their SQL
 * oracles pin that width); a store written at one width must be read
 * at the same width end-to-end — pass `fpBits = Dedup.SimBits`
 * explicitly to keep operating a legacy 32-bit store.
 */
object StreamingSimhashDedup {

  private val fpSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("fp", LongType)))

  private def readOrEmpty(spark: SparkSession, dir: String,
                          schema: StructType): DataFrame = {
    val p = new Path(dir)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The near-dup pair frame for one micro-batch, built ONLY from the
   *  maintained fingerprint store + the batch itself — corpus text is
   *  not an input (audited in PlanAuditSpec: the plan's only file scan
   *  is the fp store). */
  def triggerPairs(spark: SparkSession, batch: DataFrame, fpDir: String,
                   maxHamming: Int, idFamily: String,
                   fpBits: Int = Dedup.SimBitsWide,
                   batchFingerprints: Option[Dedup.TaggedFingerprints] = None): DataFrame =
    Dedup.dedupSimhashIncremental(
      batch.limit(0), batch, maxHamming, idFamily,
      corpusFingerprints = Some(readOrEmpty(spark, fpDir, fpSchema)),
      fpBits = fpBits, batchFingerprints = batchFingerprints)

  /** One micro-batch: detect pairs, append survivors to the doc store,
   *  append the survivors' fingerprints to the fp store. Both appends
   *  are O(batch). `fpBits` = [[Dedup.SimBitsWide]] is the corpus-scale
   *  setting (16-bit bands keep band-bucket occupancy flat — the
   *  32-bit default's trigger cost grows linearly with the store,
   *  measured in bench_sf10_r14); the store must be written with the
   *  SAME width end-to-end. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
                   pairsDir: String, fpDir: String,
                   maxHamming: Int, idFamily: String,
                   fpBits: Int = Dedup.SimBitsWide): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "text")
    // r16: ONE fingerprint pass per trigger — the probe and the fp
    // store append previously each ran the batch's shingle+vote pass
    // from text; the shared frame is delta-sized and dropped below.
    val batchFp = Dedup.simhashFingerprints(b, idFamily, fpBits).cache()
    val pairs = triggerPairs(spark, b, fpDir, maxHamming, idFamily, fpBits,
        batchFingerprints =
          Some(Dedup.TaggedFingerprints(batchFp, idFamily, fpBits)))
      .cache()
    // r17 (guide §2.6 via StateWrites): the pairs append is
    // independent of the survivor chain once the pair cache is
    // filled; within the chain the doc-store and fp-store appends
    // both read the materialized survivor cache.
    pairs.count()
    // Same orientation-blind rule as StreamingDedup: doc_b of any pair
    // drops; doc_a drops only when its partner is a corpus doc.
    val batchIds = b.select("doc_id")
    val dropAsA = pairs
      .join(batchIds.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
      .select(col("doc_a").as("doc_id"))
    val dupIds = pairs.select(col("doc_b").as("doc_id"))
      .union(dropAsA).distinct()
    val survivors = b.join(dupIds, Seq("doc_id"), "left_anti").cache()
    StateWrites.overlap(
      () => pairs.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(pairsDir),
      () => {
        survivors.count()
        StateWrites.overlap(
          () => survivors.write.mode("append").parquet(storeDir),
          // survivor fps = the shared batch fp frame restricted to
          // survivor ids (fingerprints are per-doc deterministic —
          // identical rows to re-deriving them from survivor text)
          () => batchFp
            .join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")
            .write.mode("append").parquet(fpDir))
      })
    survivors.unpersist()
    pairs.unpersist()
    batchFp.unpersist()
  }

  /** Offline state maintenance between stream restarts: replayed
   *  batches append byte-identical (doc_id, fp) rows, so compaction is
   *  a plain distinct + rewrite via the same crash-safe
   *  tmp-write + rename-swap as [[StreamingDedup.compactState]]. */
  def compactState(spark: SparkSession, storeDir: String,
                   fpDir: String = null, partitions: Int = 32): Unit = {
    val dir = Option(fpDir).getOrElse(storeDir + "_fp")
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new Path(dir)
    val fs = path.getFileSystem(hconf)
    if (!fs.exists(path)) return
    val tmp = new Path(dir + ".compact-tmp")
    val old = new Path(dir + ".compact-old")
    spark.read.schema(fpSchema).parquet(dir)
      .distinct().repartition(partitions)
      .write.parquet(tmp.toString)
    fs.delete(old, true)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compactState: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new java.io.IOException(s"compactState: cannot install $tmp")
    }
    fs.delete(old, true)
  }

  /** Start the loop over a streaming documents frame (schema must
   *  include `doc_id` and `text`). The fp state store defaults to a
   *  sibling of `storeDir`. */
  def dedupedDocStream(docs: DataFrame, storeDir: String, pairsDir: String,
                       checkpoint: String, maxHamming: Int = 3,
                       idFamily: String = "md5",
                       fpDir: String = null,
                       fpBits: Int = Dedup.SimBitsWide): StreamingQuery = {
    val dir = Option(fpDir).getOrElse(storeDir + "_fp")
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, pairsDir, dir,
          maxHamming, idFamily, fpBits)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
