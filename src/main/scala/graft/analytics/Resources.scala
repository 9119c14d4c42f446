package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Round.r4
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte

/**
 * Resource-usage summary and the per-app executor summary.
 *
 * Reference behavior:
 *  - resource-usage summary: src/storage/duckdb_store_backup.rs:250-285
 *  - executor summary (4-CTE JSON extraction + added/removed/task-metrics
 *    full-outer joins): src/storage/duckdb_store_backup.rs:321-452
 *
 * Scale notes: the task-metrics side aggregates down to per-(app,
 * executor) cardinality BEFORE any join (as the reference does), so the
 * full-outer joins run over tiny inputs that AQE broadcast-joins; no
 * per-task rows ever cross a join boundary.
 */
object Resources {

  /** app_id x event_type x day event counts + avg duration.
   *  Reference: duckdb_store_backup.rs:255-263. */
  def resourceUsage(canon: DataFrame): DataFrame =
    canon.filter(col("event_type").isin(TaskEnd, JobEnd, StageCompleted))
      .groupBy("app_id", "event_type", "event_date")
      .agg(
        count(lit(1)).as("event_count"),
        r4(avg("duration_ms")).as("avg_duration_ms"))
      .select(col("app_id"), col("event_type"), col("event_count"),
        col("avg_duration_ms"), col("event_date"))
      .orderBy(col("event_date").desc, col("app_id"), col("event_type"))

  val resourceUsageOracle: String = canonCte + """
SELECT app_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS event_count,
       FLOOR((AVG(duration_ms)) * 10000.0 + 0.5) / 10000.0 AS avg_duration_ms,
       event_date
FROM canon
WHERE event_type IN ('SparkListenerTaskEnd', 'SparkListenerJobEnd', 'SparkListenerStageCompleted')
GROUP BY app_id, event_type, event_date
ORDER BY event_date DESC, app_id, event_type"""

  /** Executor summary per (app, executor): ExecutorAdded info,
   *  removed-state, and task metric totals, full-outer-joined.
   *  Reference: duckdb_store_backup.rs:326-452 (graft generalises the
   *  per-app `WHERE app_id = ?` into an app_id group key; filtering one
   *  app is a pushed-down predicate on the result). */
  def executorSummary(canon: DataFrame): DataFrame = {
    val isEA = col("event_type") === ExecutorAdded
    val isER = col("event_type") === ExecutorRemoved
    val isTask = col("event_type").isin(TaskStart, TaskEnd)
    // ONE conditional-aggregate pass over the (executor-add/remove +
    // task) slice replaces the former 3 pre-aggregates + 2 full-outer
    // joins: same group set (task rows only count toward a group when
    // they carry an executor_id, matching the joined shape), one
    // shuffle, partial aggregation map-side. The DuckDB oracle keeps
    // the reference's multi-CTE spelling — output rows are identical.
    canon
      .filter(isEA || isER || (isTask && col("executor_id").isNotNull))
      .groupBy("app_id", "executor_id")
      .agg(
        max(when(isEA, col("host"))).as("host_port_raw"),
        max(when(isEA, col("cores"))).as("total_cores_raw"),
        max(when(isEA, col("max_memory"))).as("max_memory_raw"),
        min(when(isEA, col("event_time_us"))).as("add_time_us"),
        max(when(isER, col("event_time_us"))).as("remove_time_us"),
        count(when(isTask, 1)).as("tm_total_tasks"),
        count(when(col("event_type") === TaskEnd, 1)).as("tm_completed_tasks"),
        sum(when(isTask, col("run_time_ms"))).as("tm_total_duration"),
        sum(when(isTask, col("gc_time_ms"))).as("tm_total_gc_time"),
        sum(when(isTask, col("input_bytes"))).as("tm_total_input_bytes"),
        sum(when(isTask, col("shuffle_read_bytes"))).as("tm_total_shuffle_read"),
        sum(when(isTask, col("shuffle_write_bytes"))).as("tm_total_shuffle_write"))
      .select(
        col("app_id"),
        coalesce(col("executor_id"), lit("driver")).as("id"),
        coalesce(col("host_port_raw"), lit("localhost:0")).as("host_port"),
        when(col("remove_time_us").isNull, 1L).otherwise(0L).as("is_active"),
        lit(0L).as("rdd_blocks"),
        lit(0L).as("memory_used"),
        lit(0L).as("disk_used"),
        coalesce(col("total_cores_raw").cast("long"), lit(1L)).as("total_cores"),
        coalesce(col("total_cores_raw").cast("long"), lit(1L)).as("max_tasks"),
        lit(0L).as("active_tasks"),
        lit(0L).as("failed_tasks"),
        coalesce(col("tm_completed_tasks"), lit(0L)).as("completed_tasks"),
        coalesce(col("tm_total_tasks"), lit(0L)).as("total_tasks"),
        coalesce(col("tm_total_duration"), lit(0L)).as("total_duration"),
        coalesce(col("tm_total_gc_time"), lit(0L)).as("total_gc_time"),
        coalesce(col("tm_total_input_bytes"), lit(0L)).as("total_input_bytes"),
        coalesce(col("tm_total_shuffle_read"), lit(0L)).as("total_shuffle_read"),
        coalesce(col("tm_total_shuffle_write"), lit(0L)).as("total_shuffle_write"),
        lit(0L).as("is_excluded"),
        coalesce(col("max_memory_raw"), lit(1073741824L)).as("max_memory"),
        lit(0L).as("resource_profile_id"),
        col("add_time_us"),
        col("remove_time_us"))
      .orderBy("app_id", "id")
  }

  val executorSummaryOracle: String = canonCte + """
, ea AS (
  SELECT app_id, executor_id,
         MAX(host) AS host_port_raw,
         MAX(cores) AS total_cores_raw,
         MAX(max_memory) AS max_memory_raw,
         MIN(event_time_us) AS add_time_us
  FROM canon WHERE event_type = 'SparkListenerExecutorAdded'
  GROUP BY app_id, executor_id),
er AS (
  SELECT app_id, executor_id, MAX(event_time_us) AS remove_time_us
  FROM canon WHERE event_type = 'SparkListenerExecutorRemoved'
  GROUP BY app_id, executor_id),
tm AS (
  SELECT app_id, executor_id,
         CAST(COUNT(*) AS BIGINT) AS tm_total_tasks,
         CAST(COUNT(CASE WHEN event_type = 'SparkListenerTaskEnd' THEN 1 END) AS BIGINT) AS tm_completed_tasks,
         CAST(SUM(run_time_ms) AS BIGINT) AS tm_total_duration,
         CAST(SUM(gc_time_ms) AS BIGINT) AS tm_total_gc_time,
         CAST(SUM(input_bytes) AS BIGINT) AS tm_total_input_bytes,
         CAST(SUM(shuffle_read_bytes) AS BIGINT) AS tm_total_shuffle_read,
         CAST(SUM(shuffle_write_bytes) AS BIGINT) AS tm_total_shuffle_write
  FROM canon
  WHERE event_type IN ('SparkListenerTaskStart', 'SparkListenerTaskEnd')
    AND executor_id IS NOT NULL
  GROUP BY app_id, executor_id),
j1 AS (
  SELECT COALESCE(ea.app_id, er.app_id) AS app_id,
         COALESCE(ea.executor_id, er.executor_id) AS executor_id,
         ea.host_port_raw, ea.total_cores_raw, ea.max_memory_raw,
         ea.add_time_us, er.remove_time_us
  FROM ea FULL OUTER JOIN er
    ON ea.app_id = er.app_id AND ea.executor_id = er.executor_id),
j2 AS (
  SELECT COALESCE(j1.app_id, tm.app_id) AS app_id,
         COALESCE(j1.executor_id, tm.executor_id) AS executor_id,
         j1.host_port_raw, j1.total_cores_raw, j1.max_memory_raw,
         j1.add_time_us, j1.remove_time_us,
         tm.tm_total_tasks, tm.tm_completed_tasks, tm.tm_total_duration,
         tm.tm_total_gc_time, tm.tm_total_input_bytes,
         tm.tm_total_shuffle_read, tm.tm_total_shuffle_write
  FROM j1 FULL OUTER JOIN tm
    ON j1.app_id = tm.app_id AND j1.executor_id = tm.executor_id)
SELECT app_id,
       COALESCE(executor_id, 'driver') AS id,
       COALESCE(host_port_raw, 'localhost:0') AS host_port,
       CAST(CASE WHEN remove_time_us IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_active,
       CAST(0 AS BIGINT) AS rdd_blocks,
       CAST(0 AS BIGINT) AS memory_used,
       CAST(0 AS BIGINT) AS disk_used,
       CAST(COALESCE(total_cores_raw, 1) AS BIGINT) AS total_cores,
       CAST(COALESCE(total_cores_raw, 1) AS BIGINT) AS max_tasks,
       CAST(0 AS BIGINT) AS active_tasks,
       CAST(0 AS BIGINT) AS failed_tasks,
       COALESCE(tm_completed_tasks, 0) AS completed_tasks,
       COALESCE(tm_total_tasks, 0) AS total_tasks,
       COALESCE(tm_total_duration, 0) AS total_duration,
       COALESCE(tm_total_gc_time, 0) AS total_gc_time,
       COALESCE(tm_total_input_bytes, 0) AS total_input_bytes,
       COALESCE(tm_total_shuffle_read, 0) AS total_shuffle_read,
       COALESCE(tm_total_shuffle_write, 0) AS total_shuffle_write,
       CAST(0 AS BIGINT) AS is_excluded,
       COALESCE(max_memory_raw, 1073741824) AS max_memory,
       CAST(0 AS BIGINT) AS resource_profile_id,
       add_time_us, remove_time_us
FROM j2
ORDER BY app_id, id"""
}
