package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.Dedup

/**
 * Streaming near-duplicate dedup of a DOCUMENT stream — the LLM
 * training-data ingest loop as one continuous query: documents arrive
 * in micro-batches, each batch is near-dup-checked against everything
 * accepted so far, survivors are appended to the corpus store, and the
 * detected pairs land in an audit store.
 *
 * Spark-native shape: `foreachBatch` turns each micro-batch into a
 * bounded frame, which [[graft.pipeline.Dedup.dedupNgramIncremental]]
 * joins against the corpus store with the batch restriction BELOW the
 * pair join — per batch the work is O(batch x matching-grams), never
 * O(corpus²), so the query's per-trigger cost tracks the arrival rate,
 * not the accumulated corpus. This composes the library's batch
 * operator into the stream instead of reimplementing dedup as opaque
 * streaming state: the corpus "state" is the parquet store itself —
 * shared with every batch consumer, compactable
 * ([[graft.sources.EventLogSource.compactStore]] pattern), and not
 * bounded by executor state-store memory the way a
 * `flatMapGroupsWithState` vocabulary would be.
 *
 * Survivor rule (deterministic): the corpus is already accepted, so a
 * batch doc pairing with ANY corpus doc is dropped no matter which
 * side of the (doc_a < doc_b)-oriented pair it landed on — ids carry
 * no arrival order, so a batch doc CAN be the smaller `doc_a` of a
 * corpus pair. Within a batch, the smaller id of a batch-batch pair
 * survives (appears only as `doc_a` of batch-batch pairs), the larger
 * is dropped. Net: drop a batch doc iff it appears as `doc_b` of any
 * pair, or as `doc_a` of a pair whose partner is a corpus (non-batch)
 * doc. Replayed batches
 * (at-least-once restart) re-derive the same survivor set against a
 * store that already contains it — re-appends are the same rows, and
 * exactly-once writers can key on the batchId `foreachBatch` hands
 * over (noted, not implemented — the audit trail tolerates dups).
 */
object StreamingDedup {

  /** Start the dedup loop over a streaming documents frame (schema
   *  must include `doc_id` and `text`). `storeDir` accumulates
   *  surviving documents; `pairsDir` the verified near-dup pairs with
   *  their batch id. */
  def dedupedDocStream(docs: DataFrame, storeDir: String, pairsDir: String,
                       checkpoint: String, maxDf: Long = 5L,
                       minJaccard: Double = 0.2): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.select("doc_id", "text")
        val haveStore = {
          val p = new Path(storeDir)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
        }
        val corpus = if (haveStore) spark.read.parquet(storeDir)
                     else b.limit(0)
        val pairs = Dedup.dedupNgramIncremental(corpus, b, maxDf, minJaccard)
          .cache()
        pairs.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(pairsDir)
        // doc_b of any pair is always dropped; doc_a is dropped only
        // when its partner is a corpus doc (anti-join on batch ids) —
        // for batch-batch pairs the smaller doc_a survives.
        val batchIds = b.select("doc_id")
        val dropAsA = pairs
          .join(batchIds.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")
          .select(col("doc_a").as("doc_id"))
        val dupIds = pairs.select(col("doc_b").as("doc_id"))
          .union(dropAsA).distinct()
        b.join(dupIds, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(storeDir)
        pairs.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
