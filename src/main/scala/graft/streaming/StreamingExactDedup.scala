package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import graft.pipeline.Dedup

/**
 * Streaming EXACT dedup of a document stream — the verbatim-copy twin
 * of [[StreamingDedup]]'s near-dup loop, and the cheaper filter an
 * ingest pipeline runs FIRST (most web-crawl duplication is exact;
 * shingling money is better spent on what survives this gate).
 *
 * State, like the near-dup loop, is parquet — two append-only stores
 * next to the accepted-document store:
 *  - a HASH store `(doc_id, content_hash)`, one row per accepted doc
 *    (count-folded at read by [[Dedup.dedupExactIncremental]]);
 *  - a BLOOM-WORD delta store `(word_idx, word)` in
 *    [[Dedup.bloomWords]] layout, bit_or-folded at read.
 *
 * Per trigger: the batch probes the folded bloom in-row, only
 * bloom-positive docs reach the hash-store verify join, batch-internal
 * copies collapse to their smallest doc_id, and the three appends
 * (docs, hashes, delta words) are all O(batch). Corpus TEXT is never
 * an input to a trigger — the only corpus-sized terms are columnar
 * scans of the two state stores, and the bloom store stays <= m/64
 * rows FOREVER (appended deltas OR into the same fixed bit space).
 * Replayed batches (at-least-once restart) re-flag themselves as
 * duplicates of their own earlier append — re-run triggers drop the
 * whole batch, append nothing new to the doc store, and only add
 * already-set bloom bits plus extra hash-store rows that bias
 * `n_corpus_copies` up, never a false survivor.
 */
object StreamingExactDedup {

  private val hashSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("content_hash", StringType)))
  private val wordSchema = StructType(Seq(
    StructField("word_idx", IntegerType), StructField("word", LongType)))

  private def readOrEmpty(spark: SparkSession, dir: String,
                          schema: StructType): DataFrame = {
    val p = new Path(dir)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** One micro-batch's dup verdict, built ONLY from the two state
   *  stores + the batch (exposed for testing and the plan audit):
   *  (doc_id, is_dup, n_corpus_copies) per batch doc. */
  def triggerFlags(spark: SparkSession, batch: DataFrame, hashDir: String,
                   wordsDir: String, mBits: Int, probes: Int): DataFrame =
    Dedup.dedupExactIncremental(
      batch.limit(0), batch, mBits, probes,
      corpusWords = Some(readOrEmpty(spark, wordsDir, wordSchema)),
      corpusHashes = Some(readOrEmpty(spark, hashDir, hashSchema)))

  /** One micro-batch of the loop: flag corpus dups, collapse
   *  batch-internal copies (smallest doc_id wins — the
   *  [[Dedup.dedupExact]] rule applied batch-locally), append
   *  survivors + their state contributions. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
                   hashDir: String, wordsDir: String,
                   mBits: Int, probes: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("doc_id", "text")
    val flags = triggerFlags(spark, b, hashDir, wordsDir, mBits, probes)
    val w = Window.partitionBy("content_hash").orderBy("doc_id")
    val survivors = b
      .join(flags.filter(col("is_dup") === 0L).select("doc_id"), "doc_id")
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("text"), col("content_hash"))
      .cache()
    // r17 (guide §2.6 via StateWrites): the three state appends all
    // read the materialized survivor cache and are independent of
    // each other — overlap them as concurrent driver jobs.
    survivors.count()
    StateWrites.overlap(
      () => survivors.select("doc_id", "text")
        .write.mode("append").parquet(storeDir),
      () => survivors.select("doc_id", "content_hash")
        .write.mode("append").parquet(hashDir),
      () => Dedup.bloomWords(survivors, mBits, probes)
        .write.mode("append").parquet(wordsDir))
    survivors.unpersist()
    ()
  }

  /** Offline state maintenance, between stream restarts: the word
   *  deltas fold to ONE row per word_idx and the hash store
   *  repartitions by hash — same read semantics, fewer files; same
   *  tmp-write + rename-swap crash discipline as
   *  [[StreamingDedup.compactState]]. */
  def compactState(spark: SparkSession, storeDir: String,
                   hashDir: String = null, wordsDir: String = null,
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
        fs.rename(old, path)
        throw new java.io.IOException(s"compactState: cannot install $tmp")
      }
      fs.delete(old, true)
    }
    val hDir = Option(hashDir).getOrElse(storeDir + "_hashes")
    val wDir = Option(wordsDir).getOrElse(storeDir + "_bloom")
    swapIn(hDir, tmp => spark.read.schema(hashSchema).parquet(hDir)
      .repartition(partitions, col("content_hash"))
      .write.parquet(tmp))
    swapIn(wDir, tmp => spark.read.schema(wordSchema).parquet(wDir)
      .groupBy("word_idx").agg(expr("bit_or(word)").as("word"))
      .coalesce(1)
      .write.parquet(tmp))
  }

  /** Start the exact-dedup ingest loop over a streaming documents
   *  frame (`doc_id`, `text`); state stores default to siblings of
   *  `storeDir`. */
  def dedupedDocStream(docs: DataFrame, storeDir: String, checkpoint: String,
                       mBits: Int = Dedup.BloomBits,
                       probes: Int = Dedup.BloomProbes,
                       hashDir: String = null,
                       wordsDir: String = null): StreamingQuery = {
    val hDir = Option(hashDir).getOrElse(storeDir + "_hashes")
    val wDir = Option(wordsDir).getOrElse(storeDir + "_bloom")
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, hDir, wDir, mBits, probes)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
