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
