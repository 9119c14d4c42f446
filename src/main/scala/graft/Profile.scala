package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one query N times in a single warm JVM and dump
  * its post-AQE executed plan — for chasing flaky timings that a
  * one-shot bench can't localise (join-strategy flips, cache thrash).
  * Usage: runMain graft.Profile <queryName> [sfDir] [iters] */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-job wall-clock breakdown (r16): a composite operator runs
    // many internal jobs (eager caches, checkpoints, bounded probes);
    // the bench's single number can't localise which of them moved.
    // This listener prints every job's duration + stage/task counts.
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(js.jobId, (System.nanoTime(), js.stageInfos.size,
            js.stageInfos.map(_.numTasks).sum))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(je.jobId)).foreach { case (t0, st, tk) =>
            println(f"[profile]   job ${je.jobId}%3d: ${(System.nanoTime() - t0) / 1e9}%6.2f s ($st stages, $tk tasks)")
          }
        }
      })
    var lastDf: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to iters) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      lastDf = SparkEntry.queries(name)(spark, sfDir)
      lastDf.write.format("noop").mode("overwrite").save()
      println(f"[profile] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(lastDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExtendedMode).takeRight(8000))
    spark.stop()
  }
}
