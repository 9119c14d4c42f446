package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte

/**
 * Application-level queries over the canonical events frame.
 *
 * Reference behavior:
 *  - application listing: src/storage/duckdb_store_backup.rs:157-221
 *  - per-app event retrieval: src/storage/duckdb_store_backup.rs:223-248
 *  - app-attempt extraction: src/storage/event_log.rs:26-165
 *  - history-server v1 application surface: src/api.rs:24-48
 *
 * Scale notes: every query is one partial-aggregating `groupBy` over the
 * frame; `app_id`/date filters are plain column predicates that Catalyst
 * pushes into the parquet scan (PushedFilters), so per-app lookups prune
 * rather than full-scan.
 */
object Applications {

  /** GROUP BY app_id with min/max timestamp + event count, date-range
   *  filters, newest-first. Reference: duckdb_store_backup.rs:168-195. */
  def appList(canon: DataFrame, minDate: Option[String] = None,
              maxDate: Option[String] = None, limit: Int = 100): DataFrame = {
    val filters = minDate.map(d => col("event_date") >= d) ++
                  maxDate.map(d => col("event_date") <= d)
    filters.foldLeft(canon)(_ filter _)
      .groupBy("app_id")
      .agg(
        min("event_time_us").as("start_time_us"),
        max("event_time_us").as("end_time_us"),
        count(lit(1)).as("event_count"))
      .orderBy(col("end_time_us").desc, col("app_id"))
      .limit(limit)
  }

  val appListOracle: String = canonCte + """
SELECT app_id,
       MIN(event_time_us) AS start_time_us,
       MAX(event_time_us) AS end_time_us,
       CAST(COUNT(*) AS BIGINT) AS event_count
FROM canon
WHERE event_date >= '2024-01-05' AND event_date <= '2024-01-25'
GROUP BY app_id
ORDER BY end_time_us DESC, app_id
LIMIT 100"""

  /** Per-app events ordered by timestamp.
   *  Reference: duckdb_store_backup.rs:223-248 (returns raw rows; graft
   *  returns the typed hot columns instead of raw JSON). */
  def appEvents(canon: DataFrame, appId: String): DataFrame =
    canon.filter(col("app_id") === appId)
      .select("event_id", "app_id", "event_type", "event_time_us",
        "job_id", "stage_id", "task_id", "duration_ms", "executor_id", "host")
      .orderBy("event_time_us", "event_id")

  val appEventsOracle: String = canonCte + """
SELECT event_id, app_id, event_type, event_time_us,
       job_id, stage_id, task_id, duration_ms, executor_id, host
FROM canon
WHERE app_id = 'app-7'
ORDER BY event_time_us, event_id"""

  /** Per-app events with the ORIGINAL event-log line (`raw` column —
   *  parse with `keepRaw = true`), matching the reference's
   *  get_app_events which serves raw_data back
   *  (duckdb_store_backup.rs:223-248). */
  def appEventsRaw(canon: DataFrame, appId: String): DataFrame =
    canon.filter(col("app_id") === appId)
      .select("event_id", "app_id", "event_type", "event_time_us", "raw")
      .orderBy("event_time_us", "event_id")

  val appEventsRawOracle: String = canonCte + """
SELECT event_id, app_id, event_type, event_time_us, raw
FROM canon
WHERE app_id = 'app-7'
ORDER BY event_time_us, event_id"""

  /** One row per application ATTEMPT — keyed (app_id, attempt_id) so a
   *  re-run app (e.g. YARN attempt 2) gets its own row: name/user/
   *  version from the Start event, start/end/duration, completed flag.
   *  Reference: src/storage/event_log.rs:26-165 and the attempt model
   *  at :112-128 (end falls back to the last event timestamp when no
   *  ApplicationEnd was seen). */
  def appAttempts(canon: DataFrame): DataFrame =
    canon.groupBy("app_id", "attempt_id")
      .agg(
        max(when(col("event_type") === AppStart, col("app_name"))).as("app_name"),
        max(when(col("event_type") === AppStart, col("app_user"))).as("spark_user"),
        max(when(col("event_type") === AppStart, col("spark_version"))).as("spark_version"),
        min(when(col("event_type") === AppStart, col("event_time_us"))).as("start_time_us"),
        max(when(col("event_type") === AppEnd, col("event_time_us"))).as("app_end_us"),
        max("event_time_us").as("last_updated_us"),
        max(when(col("event_type") === AppEnd, 1L).otherwise(0L)).as("completed"))
      .filter(col("start_time_us").isNotNull)
      .select(
        col("app_id"), col("attempt_id"),
        col("app_name"), col("spark_user"), col("spark_version"),
        col("start_time_us"),
        coalesce(col("app_end_us"), col("last_updated_us")).as("end_time_us"),
        col("last_updated_us"), col("completed"),
        ((coalesce(col("app_end_us"), col("last_updated_us")) - col("start_time_us"))
          / 1000L).cast("long").as("duration_ms"))
      .orderBy("app_id", "attempt_id")

  val appAttemptsOracle: String = canonCte + """
, agg AS (
  SELECT app_id, attempt_id,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN app_name END) AS app_name,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN app_user END) AS spark_user,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN spark_version END) AS spark_version,
         MIN(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN event_time_us END) AS start_time_us,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationEnd' THEN event_time_us END) AS app_end_us,
         MAX(event_time_us) AS last_updated_us,
         CAST(MAX(CASE WHEN event_type = 'SparkListenerApplicationEnd' THEN 1 ELSE 0 END) AS BIGINT) AS completed
  FROM canon GROUP BY app_id, attempt_id)
SELECT app_id, attempt_id, app_name, spark_user, spark_version, start_time_us,
       COALESCE(app_end_us, last_updated_us) AS end_time_us,
       last_updated_us, completed,
       CAST(TRUNC((COALESCE(app_end_us, last_updated_us) - start_time_us) / 1000.0) AS BIGINT) AS duration_ms
FROM agg
WHERE start_time_us IS NOT NULL
ORDER BY app_id, attempt_id"""

  /** History-server `/api/v1/applications` shape: attempt info + the
   *  constant resource fields the reference fabricates.
   *  Reference: src/api.rs:24-48, duckdb_store_backup.rs:201-211. */
  def apiApplications(canon: DataFrame): DataFrame =
    appAttempts(canon)
      .select(
        col("app_id").as("id"),
        col("attempt_id"),
        coalesce(col("app_name"), concat(lit("Application "), col("app_id"))).as("name"),
        lit(0L).as("cores_granted"),
        lit(0L).as("max_cores"),
        lit(1L).as("cores_per_executor"),
        lit(1024L).as("memory_per_executor_mb"),
        col("spark_user"), col("spark_version"),
        col("start_time_us"), col("end_time_us"), col("completed"))
      .orderBy("id", "attempt_id")

  val apiApplicationsOracle: String = canonCte + """
, agg AS (
  SELECT app_id, attempt_id,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN app_name END) AS app_name,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN app_user END) AS spark_user,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN spark_version END) AS spark_version,
         MIN(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN event_time_us END) AS start_time_us,
         MAX(CASE WHEN event_type = 'SparkListenerApplicationEnd' THEN event_time_us END) AS app_end_us,
         MAX(event_time_us) AS last_updated_us,
         CAST(MAX(CASE WHEN event_type = 'SparkListenerApplicationEnd' THEN 1 ELSE 0 END) AS BIGINT) AS completed
  FROM canon GROUP BY app_id, attempt_id)
SELECT app_id AS id, attempt_id,
       COALESCE(app_name, 'Application ' || app_id) AS name,
       CAST(0 AS BIGINT) AS cores_granted,
       CAST(0 AS BIGINT) AS max_cores,
       CAST(1 AS BIGINT) AS cores_per_executor,
       CAST(1024 AS BIGINT) AS memory_per_executor_mb,
       spark_user, spark_version, start_time_us,
       COALESCE(app_end_us, last_updated_us) AS end_time_us, completed
FROM agg
WHERE start_time_us IS NOT NULL
ORDER BY id, attempt_id"""
}
