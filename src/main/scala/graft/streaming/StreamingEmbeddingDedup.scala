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
 * norm) — fingerprints stay DERIVED (a pure projection over the
 * store), so band-count changes never invalidate state. Appends are
 * per-vector rows; replayed batches (at-least-once restarts)
 * re-append byte-identical rows and [[compactState]]'s distinct
 * restores one row per vector. Survivor orientation and the
 * parquet-state discipline are [[StreamingDedup]]'s — see its header.
 */
object StreamingEmbeddingDedup {

  private val qvSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("qarr", ArrayType(LongType)),
    StructField("nq", LongType)))

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
                   minCosine: Double): DataFrame =
    Embeddings.dedupEmbeddingIncremental(
      batch.limit(0), batch, minCosine,
      corpusQuantized = Some(readOrEmpty(spark, qvDir, qvSchema)))

  /** One micro-batch: detect pairs, append the surviving raw vectors
   *  to the corpus store and their quantized rows to the index store.
   *  Both appends are O(batch). */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
                   pairsDir: String, qvDir: String,
                   minCosine: Double): Unit = {
    val spark = batch.sparkSession
    val b = batch.select("vec_id", "embedding")
    val pairs = triggerPairs(spark, b, qvDir, minCosine).cache()
    pairs.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(pairsDir)
    // Same orientation-blind rule as StreamingDedup: vec_b of any pair
    // drops; vec_a drops only when its partner is a corpus vector.
    val batchIds = b.select("vec_id")
    val dropAsA = pairs
      .join(batchIds.withColumnRenamed("vec_id", "vec_b"), Seq("vec_b"), "left_anti")
      .select(col("vec_a").as("vec_id"))
    val dupIds = pairs.select(col("vec_b").as("vec_id"))
      .union(dropAsA).distinct()
    val survivors = b.join(dupIds, Seq("vec_id"), "left_anti").cache()
    survivors.write.mode("append").parquet(storeDir)
    Embeddings.quantizedIndex(survivors)
      .write.mode("append").parquet(qvDir)
    survivors.unpersist()
    pairs.unpersist()
  }

  /** Offline state maintenance between stream restarts: replayed
   *  batches append byte-identical (vec_id, qarr, nq) rows, so
   *  compaction is distinct + rewrite via the same crash-safe
   *  tmp-write + rename-swap as [[StreamingDedup.compactState]]. */
  def compactState(spark: SparkSession, storeDir: String,
                   qvDir: String = null, partitions: Int = 32): Unit = {
    val dir = Option(qvDir).getOrElse(storeDir + "_qv")
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new Path(dir)
    val fs = path.getFileSystem(hconf)
    if (!fs.exists(path)) return
    val tmp = new Path(dir + ".compact-tmp")
    val old = new Path(dir + ".compact-old")
    spark.read.schema(qvSchema).parquet(dir)
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

  /** Start the loop over a streaming embeddings frame (schema must
   *  include `vec_id` and `embedding: array<float>`). The quantized
   *  index store defaults to a sibling of `storeDir`. */
  def dedupedVecStream(vecs: DataFrame, storeDir: String, pairsDir: String,
                       checkpoint: String, minCosine: Double = 0.4,
                       qvDir: String = null): StreamingQuery = {
    val dir = Option(qvDir).getOrElse(storeDir + "_qv")
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, pairsDir, dir, minCosine)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
