package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only latency probe for the streaming cluster-fold trigger —
  * replicates Bench.streamingClusterTriggerOnce standalone so trigger
  * changes can be measured without the full bench. Round 9 history:
  * the original distributed incremental fold measured 12-14 s per
  * trigger on a 1000-pair batch (dozens of sub-second AQE stage-jobs
  * from the three store probes + the CC fixpoint + the sized/ordered
  * mapback); the two-probe + driver-union-find fold measures ~0.7 s,
  * flat from quarter- to full-size label store. */
object TriggerProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(seedN: Long, tag: String): Unit = {
      spark.catalog.clearCache()
      System.gc()
      val base = java.nio.file.Files.createTempDirectory(s"graft-prof").toString
      val labels = s"$base/labels"
      spark.range(seedN)
        .select(col("id").as("doc_id"),
          expr("id - id % 2").as("label"),
          expr("CAST(0 AS BIGINT)").as("batch_id"))
        .write.mode("overwrite").parquet(labels)
      val pairs = spark.range(1000)
        .select(expr("id * 2").as("doc_a"), (col("id") + seedN).as("doc_b"))
      val t0 = System.nanoTime()
      graft.streaming.StreamingClusters.processPairs(pairs, 1L, labels)
      println(f"[prof] $tag seed=$seedN total=${(System.nanoTime() - t0) / 1e9}%.2f s")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
    once(10000L, "warm")
    once(100000L, "quarter")
    once(400000L, "full")
    once(400000L, "full2")
    spark.stop()
  }
}
