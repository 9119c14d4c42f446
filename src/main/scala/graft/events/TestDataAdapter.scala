package graft.events

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Maps the driver's synthetic `events(event_id, ts, user_id, event_type,
 * value, props)` table into the canonical Spark-event frame
 * ([[EventModel]]), via a FROZEN deterministic arithmetic mapping that is
 * expressed identically in [[TestDataAdapter.canonCte]] (DuckDB dialect)
 * — so the driver's DuckDB oracle verifies every analytic's semantics
 * end-to-end, row-for-row, hash-for-hash.
 *
 * Cross-engine parity rules (do not break when editing):
 *  - every derived metric is an INTEGER expression (sums of integers are
 *    exact in IEEE doubles below 2^53, so aggregation order never
 *    matters);
 *  - `div` here == `//` in DuckDB (both floor for non-negative operands);
 *  - `CAST(ROUND(value * k) AS BIGINT)` is identical in both engines
 *    (value has 2 decimals, so value*k is never a .5 tie);
 *  - doubles appear only in FINAL projections and are `round(x, 4)`;
 *  - timestamps surface as epoch-micros BIGINT (`unix_micros` /
 *    `epoch_us`, both floor) or ISO `yyyy-MM-dd` strings.
 *
 * The event-type mapping spreads the 5 synthetic types over the 10
 * lifecycle event types of the reference model
 * (reference: src/spark_events.rs:21-99) so every analytic's filter is
 * exercised.
 */
object TestDataAdapter {

  import EventModel._

  /** Canonical frame from a testdata scale-factor directory.
   *  Pure projection — no shuffle; Catalyst prunes unused columns all
   *  the way into the parquet scan of downstream queries.
   *  The testdata writes ns-precision timestamps, which Spark 4 rejects
   *  by default — `nanosAsLong` reads them as epoch-nanos BIGINT and the
   *  mapping floors to micros exactly like DuckDB's `epoch_us`. */
  def canonical(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    canonicalFrom(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Same mapping over an arbitrary events-shaped DataFrame.
   *  Two-stage projection: the event-type CASE and the base integer
   *  metrics are materialised ONCE in a first select, so the 29-column
   *  second stage references plain columns instead of re-embedding the
   *  mapping expression 29 times (which bloats generated code past the
   *  JIT-friendly size and slows every downstream query). */
  def canonicalFrom(raw: DataFrame): DataFrame = {
    val tsUs0 = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }

    val staged = raw.select(
      col("event_id"), col("user_id"), tsUs0.as("ts_us"),
      when(col("event_type") === "signup",
        when(col("event_id") % 2 === 0, AppStart).otherwise(JobStart))
        .when(col("event_type") === "error",
          when(col("event_id") % 3 === 0, AppEnd)
            .when(col("event_id") % 3 === 1, ExecutorRemoved)
            .otherwise(JobEnd))
        .when(col("event_type") === "click",
          when(col("event_id") % 3 === 0, ExecutorAdded)
            .when(col("event_id") % 3 === 1, StageSubmitted)
            .otherwise(StageCompleted))
        .when(col("event_type") === "view",
          when(col("event_id") % 2 === 0, TaskEnd).otherwise(TaskStart))
        .otherwise(TaskEnd).as("etype"),
      expr("CAST(ROUND(value * 100) AS BIGINT)").as("base_ms"),
      expr("CAST(ROUND(value * 1000) AS BIGINT)").as("base_kb"))

    val tsUs = col("ts_us")
    val ts  = timestamp_micros(tsUs)
    val eid = col("event_id")
    val uid = col("user_id")
    val evtType = col("etype")
    val isTaskEnd   = evtType === TaskEnd
    val isTask      = evtType.isin(TaskStart, TaskEnd)
    val isExecAdd   = evtType === ExecutorAdded
    val isAppStart  = evtType === AppStart
    val baseMs  = col("base_ms")
    val baseKb  = col("base_kb")
    val inBytes = baseKb * 1024L

    staged.select(
      eid.as("event_id"),
      concat(lit("app-"), uid.cast("string")).as("app_id"),
      // Synthetic multi-attempt split: attempts "1"/"2" alternate in
      // event_id%4 half-cycles so BOTH attempts of an app receive
      // ApplicationStart events (signup ∧ even id covers %4∈{0,2}).
      expr("CAST(1 + ((event_id % 4) div 2) AS STRING)").as("attempt_id"),
      evtType.as("event_type"),
      ts.as("event_time"),
      tsUs.as("event_time_us"),
      date_format(ts, "yyyy-MM-dd").as("event_date"),
      when(evtType.isin(JobStart, JobEnd), eid % 50).as("job_id"),
      when(evtType.isin(StageSubmitted, StageCompleted, TaskStart, TaskEnd),
        eid % 20).as("stage_id"),
      when(isTask, eid).as("task_id"),
      when(isTaskEnd, baseMs).as("duration_ms"),
      when(isTask || evtType.isin(ExecutorAdded, ExecutorRemoved),
        (uid % 8).cast("string")).as("executor_id"),
      when(isTask || isExecAdd,
        concat(lit("host-"), (uid % 4).cast("string"))).as("host"),
      when(isExecAdd, (lit(2) + (uid % 6)).cast("int")).as("cores"),
      when(isExecAdd, (lit(1L) + (uid % 4)) * 1073741824L).as("max_memory"),
      when(isTaskEnd, baseMs).as("run_time_ms"),
      when(isTaskEnd, baseMs * (lit(3L) + eid % 5) * 100000L).as("cpu_time_ns"),
      when(isTaskEnd, expr("base_ms div 12")).as("gc_time_ms"),
      when(isTaskEnd, inBytes).as("input_bytes"),
      when(isTaskEnd, expr("(base_kb * 1024) div 4")).as("output_bytes"),
      when(isTaskEnd, baseMs * 512L).as("shuffle_read_bytes"),
      when(isTaskEnd, baseMs * 256L).as("shuffle_write_bytes"),
      when(isTaskEnd,
        when(eid % 7 === 0, expr("(base_kb * 1024) div 10"))
        .otherwise(0L)).as("memory_spilled_bytes"),
      when(isTaskEnd,
        when(eid % 11 === 0, expr("(base_kb * 1024) div 20"))
        .otherwise(0L)).as("disk_spilled_bytes"),
      when(isTaskEnd, (lit(1L) + eid % 64) * 16777216L).as("peak_memory_bytes"),
      when(isTaskEnd, (lit(2L) + uid % 4) * 536870912L).as("jvm_heap_bytes"),
      when(isTask,
        when(eid % 10 < 5, "PROCESS_LOCAL")
          .when(eid % 10 < 8, "NODE_LOCAL")
          .when(eid % 10 === 8, "RACK_LOCAL")
          .otherwise("ANY")).as("locality"),
      when(isTaskEnd,
        when(eid % 19 === 0, "ExceptionFailure").otherwise("Success"))
        .as("end_reason"),
      // ExecutorRemoved rows all have eid % 3 == 1, so the reason must
      // vary on a coprime axis (eid % 2)
      when(evtType === ExecutorRemoved,
        when(eid % 2 === 0, "Executor killed by driver")
          .otherwise("Heartbeat timeout")).as("removed_reason"),
      when(isAppStart, concat(lit("user_"), uid.cast("string"))).as("app_user"),
      when(isAppStart, concat(lit("3."), (uid % 3).cast("string"), lit(".0")))
        .as("spark_version"),
      when(isAppStart, concat(lit("job-"), (uid % 10).cast("string")))
        .as("app_name")
    )
      // Raw-event passthrough stand-in (reference keeps the original
      // JSON line next to the typed columns, duckdb_store_backup.rs:
      // 223-248): a deterministic pseudo-JSON assembled from the typed
      // columns so the oracle can reproduce it character-for-character.
      .withColumn("raw", concat(
        lit("{\"Event\":\""), col("event_type"),
        lit("\",\"ID\":"), col("event_id").cast("string"),
        lit(",\"Timestamp\":"), col("event_time_us").cast("string"),
        lit("}")))
  }

  /** DuckDB CTE that reproduces [[canonicalFrom]] bit-for-bit over the
   *  driver-registered `events` table. Prefix of every oracle query. */
  val canonCte: String = """WITH canon_base AS (
  SELECT
    event_id,
    'app-' || CAST(user_id AS VARCHAR) AS app_id,
    CAST(1 + (event_id % 4) // 2 AS VARCHAR) AS attempt_id,
    CASE event_type
      WHEN 'signup' THEN CASE WHEN event_id % 2 = 0 THEN 'SparkListenerApplicationStart' ELSE 'SparkListenerJobStart' END
      WHEN 'error' THEN CASE WHEN event_id % 3 = 0 THEN 'SparkListenerApplicationEnd' WHEN event_id % 3 = 1 THEN 'SparkListenerExecutorRemoved' ELSE 'SparkListenerJobEnd' END
      WHEN 'click' THEN CASE WHEN event_id % 3 = 0 THEN 'SparkListenerExecutorAdded' WHEN event_id % 3 = 1 THEN 'SparkListenerStageSubmitted' ELSE 'SparkListenerStageCompleted' END
      WHEN 'view' THEN CASE WHEN event_id % 2 = 0 THEN 'SparkListenerTaskEnd' ELSE 'SparkListenerTaskStart' END
      ELSE 'SparkListenerTaskEnd'
    END AS event_type,
    ts AS event_time,
    epoch_us(ts) AS event_time_us,
    strftime(ts, '%Y-%m-%d') AS event_date,
    CASE WHEN event_type = 'signup' AND event_id % 2 = 1 THEN event_id % 50
         WHEN event_type = 'error' AND event_id % 3 = 2 THEN event_id % 50 END AS job_id,
    CASE WHEN (event_type = 'click' AND event_id % 3 >= 1) OR event_type IN ('view', 'purchase') THEN event_id % 20 END AS stage_id,
    CASE WHEN event_type IN ('view', 'purchase') THEN event_id END AS task_id,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CAST(ROUND(value * 100) AS BIGINT) END AS duration_ms,
    CASE WHEN event_type IN ('view', 'purchase') OR (event_type = 'click' AND event_id % 3 = 0) OR (event_type = 'error' AND event_id % 3 = 1) THEN CAST(user_id % 8 AS VARCHAR) END AS executor_id,
    CASE WHEN event_type IN ('view', 'purchase') OR (event_type = 'click' AND event_id % 3 = 0) THEN 'host-' || CAST(user_id % 4 AS VARCHAR) END AS host,
    CASE WHEN event_type = 'click' AND event_id % 3 = 0 THEN CAST(2 + user_id % 6 AS INTEGER) END AS cores,
    CASE WHEN event_type = 'click' AND event_id % 3 = 0 THEN (1 + user_id % 4) * 1073741824 END AS max_memory,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CAST(ROUND(value * 100) AS BIGINT) END AS run_time_ms,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CAST(ROUND(value * 100) AS BIGINT) * (3 + event_id % 5) * 100000 END AS cpu_time_ns,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CAST(ROUND(value * 100) AS BIGINT) // 12 END AS gc_time_ms,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CAST(ROUND(value * 1000) AS BIGINT) * 1024 END AS input_bytes,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN (CAST(ROUND(value * 1000) AS BIGINT) * 1024) // 4 END AS output_bytes,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CAST(ROUND(value * 100) AS BIGINT) * 512 END AS shuffle_read_bytes,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CAST(ROUND(value * 100) AS BIGINT) * 256 END AS shuffle_write_bytes,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CASE WHEN event_id % 7 = 0 THEN (CAST(ROUND(value * 1000) AS BIGINT) * 1024) // 10 ELSE 0 END END AS memory_spilled_bytes,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CASE WHEN event_id % 11 = 0 THEN (CAST(ROUND(value * 1000) AS BIGINT) * 1024) // 20 ELSE 0 END END AS disk_spilled_bytes,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN (1 + event_id % 64) * 16777216 END AS peak_memory_bytes,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN (2 + user_id % 4) * 536870912 END AS jvm_heap_bytes,
    CASE WHEN event_type IN ('view', 'purchase') THEN
      CASE WHEN event_id % 10 < 5 THEN 'PROCESS_LOCAL' WHEN event_id % 10 < 8 THEN 'NODE_LOCAL' WHEN event_id % 10 = 8 THEN 'RACK_LOCAL' ELSE 'ANY' END END AS locality,
    CASE WHEN event_type = 'purchase' OR (event_type = 'view' AND event_id % 2 = 0) THEN CASE WHEN event_id % 19 = 0 THEN 'ExceptionFailure' ELSE 'Success' END END AS end_reason,
    CASE WHEN event_type = 'error' AND event_id % 3 = 1 THEN
      CASE WHEN event_id % 2 = 0 THEN 'Executor killed by driver' ELSE 'Heartbeat timeout' END END AS removed_reason,
    CASE WHEN event_type = 'signup' AND event_id % 2 = 0 THEN 'user_' || CAST(user_id AS VARCHAR) END AS app_user,
    CASE WHEN event_type = 'signup' AND event_id % 2 = 0 THEN '3.' || CAST(user_id % 3 AS VARCHAR) || '.0' END AS spark_version,
    CASE WHEN event_type = 'signup' AND event_id % 2 = 0 THEN 'job-' || CAST(user_id % 10 AS VARCHAR) END AS app_name
  FROM events
), canon AS (
  SELECT c.*,
         '{"Event":"' || event_type || '","ID":' || CAST(event_id AS VARCHAR)
           || ',"Timestamp":' || CAST(event_time_us AS VARCHAR) || '}' AS raw
  FROM canon_base c
)"""
}
