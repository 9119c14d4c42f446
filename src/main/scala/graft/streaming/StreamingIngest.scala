package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.events.EventLogParser

/**
 * Structured-Streaming ingest of Spark event logs: continuously tails a
 * log directory, parses each micro-batch with the same explicit-schema
 * parser as the batch path, and can maintain a live per-app/per-day
 * aggregate with watermarked state.
 *
 * This is the Spark-native replacement for the reference's polling
 * event processor (src/event_processor.rs:148-527): the file-source
 * offset log gives exactly-once new-file tracking for free, and
 * `maxFilesPerTrigger` bounds each batch the way the reference's batch
 * size does.
 */
object StreamingIngest {

  /** Streaming canonical frame from a log directory. */
  def readStream(spark: SparkSession, dirUri: String,
                 maxFilesPerTrigger: Int = 64): DataFrame = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dirUri)
      .withColumn("log_file", input_file_name())
    EventLogParser.parseLines(lines)
  }

  /** Continuously materialise the canonical frame to a partitioned
   *  parquet store (the streaming twin of EventLogSource.writeStore). */
  def sinkToStore(canon: DataFrame, outDir: String,
                  checkpoint: String): StreamingQuery =
    canon.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .partitionBy("event_date")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Identifying key of an event within a log stream — the dedup key
   *  for at-least-once re-deliveries (a grown `.inprogress` file
   *  re-emitted by [[graft.sources.IncrementalIngest]], an S3 listing
   *  race, a restarted tailer). */
  private val eventKey = Seq("app_id", "event_type", "event_time_us",
    "job_id", "stage_id", "task_id", "executor_id")

  /** Exactly-once repair over an at-least-once source: drop
   *  re-delivered events within the watermark horizon.
   *  `dropDuplicatesWithinWatermark` keeps one state row per distinct
   *  key seen inside the horizon and evicts it when the watermark
   *  passes — state is bounded by event rate x horizon, never total
   *  volume. Events without an event time (EnvironmentUpdate) cannot
   *  be watermarked; they bypass dedup via a union (documented
   *  at-least-once for that sliver). */
  def dedupedStream(canon: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val timed = canon.filter(col("event_time").isNotNull)
      .withWatermark("event_time", horizon)
      .dropDuplicatesWithinWatermark(eventKey)
    timed.unionByName(canon.filter(col("event_time").isNull))
  }

  /** Sliding-window event rate per app (the live throughput strip):
   *  windowed count with a watermark, so state is bounded by
   *  apps x windows-in-horizon. */
  def slidingEventRate(canon: DataFrame, windowLen: String = "5 minutes",
                       slide: String = "1 minute",
                       horizon: String = "10 minutes"): DataFrame =
    canon.filter(col("event_time").isNotNull)
      .withWatermark("event_time", horizon)
      .groupBy(window(col("event_time"), windowLen, slide), col("app_id"))
      .agg(count(lit(1)).as("event_count"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("app_id"), col("event_count"))

  /** Live per-(app, day) rolling aggregate with a 1-day watermark: the
   *  streaming version of the perf-trends analytic. State is bounded by
   *  (apps x days) inside the watermark, not by event volume. */
  def liveAppDayCounts(canon: DataFrame): DataFrame =
    canon
      .withWatermark("event_time", "1 day")
      .groupBy(window(col("event_time"), "1 day"), col("app_id"))
      .agg(
        count(lit(1)).as("event_count"),
        sum("duration_ms").as("total_duration_ms"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("date"),
        col("app_id"), col("event_count"), col("total_duration_ms"))
}
