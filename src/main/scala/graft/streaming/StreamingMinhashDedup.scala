package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.pipeline.Dedup

/**
 * Streaming MinHash near-dup dedup — the sketch-family member of the
 * streaming dedup loops ([[StreamingDedup]] = n-gram Jaccard over a
 * shingle + gram-df store, [[StreamingExactDedup]] = verbatim copies
 * over a bloom + hash store, [[StreamingSimhashDedup]] = hamming-ball
 * near-dups over a fingerprint store, this = banded-LSH near-dups over
 * a SIGNATURE store). MinHash's incremental story needs no df state at
 * all: signatures are per-document, so a trigger computes the BATCH's
 * shingles + 16-column signature (O(batch)), band-joins them against
 * the signature store, and verifies candidates by exact Jaccard
 * against the shingle store — the batch restriction sits below the
 * pair join, per-trigger compute is O(batch), and the only O(corpus)
 * terms are the two columnar store scans. Corpus TEXT is never read by
 * a trigger (plan-audited in PlanAuditSpec).
 *
 * State per corpus doc: 16 longs (signature store, banded candidates)
 * + its shingle rows (shingle store, exact verify). Both stores append
 * per-document rows — there is nothing to fold at read time, so
 * replayed batches (at-least-once restarts) re-append byte-identical
 * rows and [[compactState]]'s distinct restores one row per key.
 * Survivor orientation, replay tolerance, and the parquet-state
 * discipline are [[StreamingDedup]]'s — see its header.
 */
object StreamingMinhashDedup {

  private val shingleSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("gram", StringType)))
  private val sigSchema = StructType(
    StructField("doc_id", LongType) +:
      (0 until Dedup.NumHashes).map(j => StructField(s"mh$j", LongType)))

  private def readOrEmpty(spark: SparkSession, dir: String,
                          schema: StructType): DataFrame = {
    val p = new Path(dir)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** The near-dup pair frame for one micro-batch, built ONLY from the
   *  maintained signature + shingle stores and the batch itself —
   *  corpus text is not an input (audited in PlanAuditSpec: the plan's
   *  only file scans are the two stores). */
  def triggerPairs(spark: SparkSession, batch: DataFrame, shingleDir: String,
                   sigDir: String, minJaccard: Double,
                   idFamily: String): DataFrame =
    Dedup.dedupMinhashIncremental(
      batch.limit(0), batch, minJaccard, idFamily,
      corpusShingles = Some(readOrEmpty(spark, shingleDir, shingleSchema)),
      corpusSignatures = Some(readOrEmpty(spark, sigDir, sigSchema)))

  /** One micro-batch: detect pairs, append survivors to the doc store,
   *  extend the shingle + signature stores with the survivors' rows.
   *  All three appends are O(batch). */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
                   pairsDir: String, shingleDir: String, sigDir: String,
                   minJaccard: Double, idFamily: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "text")
    val pairs = triggerPairs(spark, b, shingleDir, sigDir, minJaccard, idFamily)
      .cache()
    // r17 (guide §2.6 via StateWrites): the pairs append is
    // independent of the survivor chain once the pair cache is
    // filled; the shingle and signature appends both read the
    // materialized survivor cache and are independent of each other.
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
        survivors.write.mode("append").parquet(storeDir)
        StateWrites.overlap(
          () => Dedup.shingles(survivors)
            .write.mode("append").parquet(shingleDir),
          () => Dedup.minhashSignatures(survivors, idFamily)
            .write.mode("append").parquet(sigDir))
      })
    survivors.unpersist()
    pairs.unpersist()
  }

  /** Offline state maintenance between stream restarts: replayed
   *  batches append byte-identical per-document rows to both stores,
   *  so compaction is distinct + rewrite via the same crash-safe
   *  tmp-write + rename-swap as [[StreamingDedup.compactState]]. */
  def compactState(spark: SparkSession, storeDir: String,
                   shingleDir: String = null, sigDir: String = null,
                   partitions: Int = 32): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def swapIn(dir: String, write: String => Unit): Unit = {
      val path = new Path(dir)
      val fs = path.getFileSystem(hconf)
      if (!fs.exists(path)) return
      val tmp = new Path(dir + ".compact-tmp")
      val old = new Path(dir + ".compact-old")
      write(tmp.toString)
      fs.delete(old, true)
      if (!fs.rename(path, old))
        throw new java.io.IOException(s"compactState: cannot move $path aside")
      if (!fs.rename(tmp, path)) {
        fs.rename(old, path) // roll back
        throw new java.io.IOException(s"compactState: cannot install $tmp")
      }
      fs.delete(old, true)
    }
    val shDir = Option(shingleDir).getOrElse(storeDir + "_shingles")
    val sDir = Option(sigDir).getOrElse(storeDir + "_sig")
    swapIn(shDir, tmp => spark.read.schema(shingleSchema).parquet(shDir)
      .distinct().repartition(partitions, col("gram")).write.parquet(tmp))
    swapIn(sDir, tmp => spark.read.schema(sigSchema).parquet(sDir)
      .distinct().repartition(partitions).write.parquet(tmp))
  }

  /** Start the loop over a streaming documents frame (schema must
   *  include `doc_id` and `text`). The shingle/signature state stores
   *  default to siblings of `storeDir`. */
  def dedupedDocStream(docs: DataFrame, storeDir: String, pairsDir: String,
                       checkpoint: String, minJaccard: Double = 0.2,
                       idFamily: String = "md5",
                       shingleDir: String = null,
                       sigDir: String = null): StreamingQuery = {
    val shDir = Option(shingleDir).getOrElse(storeDir + "_shingles")
    val sDir = Option(sigDir).getOrElse(storeDir + "_sig")
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, pairsDir, shDir, sDir,
          minJaccard, idFamily)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
