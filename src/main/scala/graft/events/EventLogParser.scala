package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Parser for real Spark event logs (line-delimited JSON of
 * `SparkListener*` events) into the canonical frame ([[EventModel]]).
 *
 * Reference behavior: src/spark_events.rs:120-265 (`from_json` +
 * `extract_fields`) and src/storage/event_log.rs:26-165 (app-start
 * payload).
 *
 * Scale design:
 *  - `spark.read.text` + `from_json` with an EXPLICIT schema: schema
 *    inference would double-read a 100 TB corpus; an explicit schema
 *    makes parsing a single streaming pass and keeps unknown event
 *    types as cheap nulls.
 *  - Only the hot fields the analytics need are extracted; everything
 *    else in a line is skipped by the JSON parser (column pruning
 *    reaches Jackson via the pruned struct schema).
 *  - app_id comes from the log file name (one Spark app writes one
 *    log), falling back to the embedded `App ID` — so parsing needs no
 *    per-app driver loop; a directory of 100k logs is one distributed
 *    read.
 *  - Output is meant to be written `partitionBy(event_date)` (see
 *    [[graft.sources.EventLogStore]]) so per-app/per-day analytics
 *    prune partitions.
 */
object EventLogParser {

  /** Pruned schema of a SparkListener event line: exactly the fields
   *  the reference extracts (spark_events.rs:158-265 + the task-metric
   *  JSON paths of duckdb_store_backup.rs:326-452). */
  val eventSchema: StructType = StructType(Seq(
    StructField("Event", StringType),
    StructField("Timestamp", LongType),
    StructField("Job ID", LongType),
    StructField("Completion Time", LongType),
    StructField("Submission Time", LongType),
    StructField("App ID", StringType),
    StructField("App Name", StringType),
    StructField("App Attempt ID", StringType),
    StructField("User", StringType),
    StructField("Spark Version", StringType),
    StructField("Executor ID", StringType),
    StructField("Removed Reason", StringType),
    StructField("Stage Info", StructType(Seq(
      StructField("Stage ID", LongType),
      StructField("Submission Time", LongType),
      StructField("Completion Time", LongType)))),
    StructField("Executor Info", StructType(Seq(
      StructField("Host", StringType),
      StructField("Total Cores", LongType),
      StructField("Max Memory", LongType)))),
    StructField("Task Info", StructType(Seq(
      StructField("Task ID", LongType),
      StructField("Stage ID", LongType),
      StructField("Executor ID", StringType),
      StructField("Host", StringType),
      StructField("Locality", StringType),
      StructField("Launch Time", LongType),
      StructField("Finish Time", LongType)))),
    StructField("Task End Reason", StructType(Seq(
      StructField("Reason", StringType)))),
    StructField("Task Metrics", StructType(Seq(
      StructField("Executor Run Time", LongType),
      StructField("Executor CPU Time", LongType),
      StructField("JVM GC Time", LongType),
      StructField("Peak Execution Memory", LongType),
      StructField("Memory Bytes Spilled", LongType),
      StructField("Disk Bytes Spilled", LongType),
      StructField("Input Metrics", StructType(Seq(
        StructField("Bytes Read", LongType)))),
      StructField("Output Metrics", StructType(Seq(
        StructField("Bytes Written", LongType)))),
      StructField("Shuffle Read Metrics", StructType(Seq(
        StructField("Total Bytes Read", LongType),
        StructField("Remote Bytes Read", LongType),
        StructField("Local Bytes Read", LongType)))),
      StructField("Shuffle Write Metrics", StructType(Seq(
        StructField("Shuffle Bytes Written", LongType),
        StructField("Bytes Written", LongType))))))),
    StructField("Task Executor Metrics", StructType(Seq(
      StructField("JVMHeapMemory", LongType)))),
    // SparkListenerBlockManagerAdded/Removed
    StructField("Block Manager ID", StructType(Seq(
      StructField("Executor ID", StringType),
      StructField("Host", StringType),
      StructField("Port", LongType)))),
    StructField("Maximum Memory", LongType),
    // SparkListenerEnvironmentUpdate ([[k,v],...] pairs)
    StructField("Spark Properties", ArrayType(ArrayType(StringType))),
    // SQL execution events
    StructField("executionId", LongType),
    StructField("time", LongType)
  ))

  /** Parse raw event-log lines (column `value` + `log_file`) into the
   *  canonical frame.
   *
   *  `keepRaw = true` carries the original JSON line through as a `raw`
   *  column (reference stores raw_data next to the typed columns and
   *  serves it back, duckdb_store_backup.rs:223-248) — cheap, the line
   *  is already in hand; store it as a separate column/file so typed
   *  scans never pay for it.
   *
   *  Attempt attribution: one log file is one application attempt
   *  (reference: src/storage/event_log.rs:112-128), so in batch mode
   *  the `App Attempt ID` of the file's ApplicationStart line is
   *  propagated to every event of that file (a per-file window — one
   *  ingest-time shuffle keyed by file, never paid at query time). In
   *  streaming mode (no windows over unbounded input) `attempt_id` is
   *  only set on the start rows themselves.
   *
   *  An optional `attempt_hint` input column backstops both modes: a
   *  caller that KNOWS the file's attempt (e.g. the incremental
   *  ingester replaying a grown file's tail, whose ApplicationStart
   *  line was consumed in an earlier scan) passes it per line and it
   *  fills `attempt_id` wherever no start line is in view. */
  def parseLines(lines: DataFrame, keepRaw: Boolean = false): DataFrame = {
    import EventModel._
    val e = from_json(col("value"), eventSchema)
    val evtType = e("Event")
    val isTask = evtType.isin(TaskStart, TaskEnd)
    val tsMs = coalesce(e("Timestamp"),
      e("Task Info")("Finish Time"), e("Task Info")("Launch Time"),
      e("Stage Info")("Completion Time"), e("Stage Info")("Submission Time"),
      e("Completion Time"), e("Submission Time"), e("time"))
    val tsUs = tsMs * 1000L
    // Streaming sources cannot use monotonically_increasing_id; a hash
    // of (file, line) is a stable synthetic id in both modes.
    val eventId =
      if (lines.isStreaming) xxhash64(col("log_file"), col("value"))
      else monotonically_increasing_id()
    val base = lines
      .withColumn("e", e)
      .select(
        eventId.as("event_id"),
        coalesce(col("e")("App ID"),
          regexp_replace(element_at(split(col("log_file"), "/"), -1),
            "\\.(json|log|txt)(\\.gz|\\.lz4|\\.snappy)?$", "")).as("app_id"),
        col("e")("Event").as("event_type"),
        timestamp_micros(tsUs).as("event_time"),
        tsUs.as("event_time_us"),
        date_format(timestamp_micros(tsUs), "yyyy-MM-dd").as("event_date"),
        when(col("e")("Event").isin(JobStart, JobEnd), col("e")("Job ID")).as("job_id"),
        when(col("e")("Event").isin(StageSubmitted, StageCompleted),
          col("e")("Stage Info")("Stage ID"))
          .when(col("e")("Event").isin(TaskStart, TaskEnd),
            col("e")("Task Info")("Stage ID")).as("stage_id"),
        when(col("e")("Event").isin(TaskStart, TaskEnd),
          col("e")("Task Info")("Task ID")).as("task_id"),
        when(col("e")("Event").isin(SqlExecutionStart, SqlExecutionEnd),
          col("e")("executionId")).as("sql_execution_id"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Executor Run Time")).as("duration_ms"),
        when(col("e")("Event").isin(TaskStart, TaskEnd),
          col("e")("Task Info")("Executor ID"))
          .when(col("e")("Event").isin(ExecutorAdded, ExecutorRemoved),
            col("e")("Executor ID"))
          .when(col("e")("Event").isin(BlockManagerAdded, BlockManagerRemoved),
            col("e")("Block Manager ID")("Executor ID")).as("executor_id"),
        when(col("e")("Event").isin(TaskStart, TaskEnd),
          col("e")("Task Info")("Host"))
          .when(col("e")("Event") === ExecutorAdded,
            col("e")("Executor Info")("Host"))
          .when(col("e")("Event").isin(BlockManagerAdded, BlockManagerRemoved),
            col("e")("Block Manager ID")("Host")).as("host"),
        when(col("e")("Event") === ExecutorAdded,
          col("e")("Executor Info")("Total Cores").cast("int")).as("cores"),
        when(col("e")("Event") === ExecutorAdded,
          col("e")("Executor Info")("Max Memory"))
          .when(col("e")("Event") === BlockManagerAdded,
            col("e")("Maximum Memory")).as("max_memory"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Executor Run Time")).as("run_time_ms"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Executor CPU Time")).as("cpu_time_ns"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("JVM GC Time")).as("gc_time_ms"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Input Metrics")("Bytes Read")).as("input_bytes"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Output Metrics")("Bytes Written")).as("output_bytes"),
        when(col("e")("Event") === TaskEnd,
          coalesce(col("e")("Task Metrics")("Shuffle Read Metrics")("Total Bytes Read"),
            col("e")("Task Metrics")("Shuffle Read Metrics")("Remote Bytes Read")
              + col("e")("Task Metrics")("Shuffle Read Metrics")("Local Bytes Read")))
          .as("shuffle_read_bytes"),
        when(col("e")("Event") === TaskEnd,
          coalesce(col("e")("Task Metrics")("Shuffle Write Metrics")("Shuffle Bytes Written"),
            col("e")("Task Metrics")("Shuffle Write Metrics")("Bytes Written")))
          .as("shuffle_write_bytes"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Memory Bytes Spilled")).as("memory_spilled_bytes"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Disk Bytes Spilled")).as("disk_spilled_bytes"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Metrics")("Peak Execution Memory")).as("peak_memory_bytes"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task Executor Metrics")("JVMHeapMemory")).as("jvm_heap_bytes"),
        when(isTask, col("e")("Task Info")("Locality")).as("locality"),
        when(col("e")("Event") === TaskEnd,
          col("e")("Task End Reason")("Reason")).as("end_reason"),
        when(col("e")("Event") === ExecutorRemoved,
          col("e")("Removed Reason")).as("removed_reason"),
        when(col("e")("Event") === AppStart, col("e")("User")).as("app_user"),
        // Spark version: from ApplicationStart, else from the
        // EnvironmentUpdate property pairs (reference:
        // src/storage/event_log.rs:143-161).
        when(col("e")("Event") === AppStart, col("e")("Spark Version"))
          .when(col("e")("Event") === EnvironmentUpdate,
            expr("filter(e.`Spark Properties`, " +
              "p -> p[0] IN ('spark.app.version', 'spark.version'))[0][1]"))
          .as("spark_version"),
        when(col("e")("Event") === AppStart, col("e")("App Name")).as("app_name"),
        when(col("e")("Event") === AppStart, col("e")("App Attempt ID"))
          .as("attempt_raw"),
        // Full Spark-properties map from EnvironmentUpdate (reference
        // parses these at src/storage/event_log.rs:143-161; the API
        // route is src/api.rs:43-45).
        when(col("e")("Event") === EnvironmentUpdate,
          expr("map_from_entries(transform(e.`Spark Properties`, " +
            "p -> struct(p[0] AS key, p[1] AS value)))")).as("spark_props"),
        col("log_file"), col("value"),
        (if (lines.columns.contains("attempt_hint")) col("attempt_hint")
         else lit(null).cast("string")).as("attempt_hint"))
    val attributed =
      if (lines.isStreaming)
        base.withColumn("attempt_id",
          coalesce(col("attempt_raw"), col("attempt_hint")))
      else base.withColumn("attempt_id",
        coalesce(
          max("attempt_raw").over(
            org.apache.spark.sql.expressions.Window.partitionBy("log_file")),
          col("attempt_hint")))
    (if (keepRaw) attributed.withColumn("raw", col("value")) else attributed)
      .drop("attempt_raw", "attempt_hint", "log_file", "value")
      .filter(col("event_type").isNotNull)
  }

  /** Read + parse event logs from any Hadoop-FS URI (file://, hdfs://,
   *  s3a:// — the FS abstraction is the URI scheme; no reader-specific
   *  code needed, matching the reference's local/HDFS/S3 readers at
   *  src/storage/file_reader.rs:32-516). */
  def read(spark: SparkSession, pathOrUris: String*): DataFrame =
    parseLines(spark.read.textFile(pathOrUris: _*).toDF("value")
      .withColumn("log_file", input_file_name()))
}
