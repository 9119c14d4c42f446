package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.pipeline.Clustering

/**
 * Streaming duplicate-CLUSTER maintenance — the state-folding half the
 * pair-emitting streaming members ([[StreamingDedup]],
 * [[StreamingMinhashDedup]], [[StreamingSimhashDedup]],
 * [[StreamingEmbeddingDedup]]) were missing: their triggers emit
 * batch-touching near-dup PAIRS, but survivor policy at corpus scale
 * is per connected COMPONENT ([[graft.pipeline.Clustering]]), and
 * rebuilding components from the full pair store every trigger is the
 * O(corpus)-per-trigger shape this family exists to avoid. This member
 * maintains the labeling incrementally: each trigger folds the batch's
 * pairs into the prior labels via
 * [[graft.pipeline.Clustering.dedupClustersIncremental]] — batch pairs
 * contract to prior labels, components run over the batch-sized
 * contracted edge list, old EDGES are never stored or re-read at all
 * (the label frame subsumes them) — and appends one delta row per
 * label that CHANGED or appeared, stamped with the batch id.
 *
 * State = ONE append-only `(doc_id, label, batch_id)` store folded by
 * LATEST-BATCH-WINS at read (`max_by(label, batch_id)`): the
 * composable complement of the SUM/bit_or folds the other members use
 * — labels are reassignments, not increments. Append volume per
 * trigger is bounded by |batch ∪ members of old clusters the batch
 * bridged|, not the corpus; untouched clusters contribute NO rows.
 *
 * Replay tolerance: a re-run batch recomputes the identical delta
 * (prior labels fold to the same frame — the re-appended rows are
 * byte-identical, and ties inside `max_by` carry equal labels).
 * Compaction = fold + crash-safe rename-swap, identical semantics
 * because the fold IS what every read does.
 */
object StreamingClusters {

  private val labelSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("label", LongType),
    StructField("batch_id", LongType)))

  private def readOrEmpty(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      spark.read.schema(labelSchema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], labelSchema)
  }

  /** The current labeling `(doc_id, label)`: latest-batch-wins fold
   *  over the delta store — what a trigger consumes and what readers
   *  (survivor selection, [[graft.pipeline.Clustering.clusterSizes]]-
   *  style rollups via `precomputedPairs`-free paths) should read. */
  def readLabels(spark: SparkSession, labelDir: String): DataFrame =
    readOrEmpty(spark, labelDir)
      .groupBy("doc_id")
      .agg(expr("max_by(label, batch_id)").as("label"))

  /** Fold one micro-batch's near-dup pairs (any pair-emitting
   *  trigger's output: (doc_a, doc_b), batch-touching) into the label
   *  store. Appends ONLY changed/new labels, stamped `batchId`.
   *
   *  The fold is TOUCHED-ONLY: the full-store `max_by` fold
   *  ([[readLabels]]) is a corpus-sized shuffle, so a trigger never
   *  runs it — it folds (a) the batch pairs' endpoints (one semi-join
   *  against the store, shuffle bounded by endpoint rows) and (b) the
   *  members of the clusters those endpoints belong to (one
   *  label-keyed semi-join; stale delta rows over-select harmlessly —
   *  their docs fold to their true current label and filter out as
   *  unchanged). Untouched clusters enter no join and no shuffle; the
   *  only O(state) term is the delta store's columnar scan, the same
   *  bound every family member documents. */
  def processPairs(batchPairs: DataFrame, batchId: Long,
                   labelDir: String): Unit = {
    val spark = batchPairs.sparkSession
    val store = readOrEmpty(spark, labelDir)
    val pairs = batchPairs.select("doc_a", "doc_b").cache()
    val ends = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val endLabels = store.join(ends, "doc_id")
      .groupBy("doc_id").agg(expr("max_by(label, batch_id)").as("label"))
    val touchedLabelVals = endLabels.select("label").distinct()
    val memberIds = store.join(touchedLabelVals, "label")
      .select("doc_id").distinct()
    val touched = ends.union(memberIds).distinct()
    val prior = store.join(touched, "doc_id")
      .groupBy("doc_id").agg(expr("max_by(label, batch_id)").as("label"))
      .cache()
    val next = Clustering.dedupClustersIncremental(prior, pairs)
      .select(col("doc_id"), col("cluster_id").as("label"))
    val delta = next.join(prior.withColumnRenamed("label", "old_label"),
        Seq("doc_id"), "left")
      .filter(col("old_label").isNull || col("old_label") =!= col("label"))
      .select(col("doc_id"), col("label"), lit(batchId).as("batch_id"))
    delta.write.mode("append").parquet(labelDir)
    prior.unpersist()
    pairs.unpersist()
  }

  /** Offline state maintenance: fold to one row per doc and rewrite
   *  compacted via the family's crash-safe tmp-write + rename-swap. */
  def compactState(spark: SparkSession, labelDir: String,
                   partitions: Int = 32): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val path = new Path(labelDir)
    val fs = path.getFileSystem(hconf)
    if (!fs.exists(path)) return
    val tmp = new Path(labelDir + ".compact-tmp")
    val old = new Path(labelDir + ".compact-old")
    readOrEmpty(spark, labelDir)
      .groupBy("doc_id")
      .agg(expr("max_by(label, batch_id)").as("label"),
        max("batch_id").as("batch_id"))
      .repartition(partitions)
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
}
