package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Round.r4
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte
import graft.operators.HistogramRank

/**
 * Cross-application analytics: corpus rollup, per-stage task
 * distribution, executor utilization, and the wide per-(app, executor,
 * host) resource-utilization rollup.
 *
 * Reference behavior:
 *  - cross-app summary: src/storage/duckdb_store_backup.rs:801-858
 *  - task distribution: src/storage/duckdb_store_backup.rs:860-931
 *  - executor utilization: src/storage/duckdb_store_backup.rs:933-1008
 *  - resource-utilization metrics: src/storage/duckdb_store_backup.rs:1010-1153
 *
 * Scale notes: single aggregation passes; the only join
 * (resourceUtilMetrics x app-status) is per-app cardinality and
 * broadcastable. `collect_set(app_id)` per executor is bounded by the
 * number of applications an executor served, not by task count.
 */
object CrossApp {

  private val taskEnd = col("event_type") === TaskEnd

  /** Single-row corpus rollup. Reference: duckdb_store_backup.rs:807-830.
   *  (The reference's `active_applications` counts distinct app_ids over
   *  non-ApplicationEnd rows — reproduced faithfully.) */
  def crossAppSummary(canon: DataFrame): DataFrame =
    canon.agg(
      countDistinct("app_id").as("total_applications"),
      countDistinct(when(col("event_type") =!= AppEnd, col("app_id")))
        .as("active_applications"),
      count(lit(1)).as("total_events"),
      count(when(taskEnd && col("end_reason") === "Success", 1))
        .as("total_tasks_completed"),
      count(when(taskEnd && col("end_reason") =!= "Success", 1))
        .as("total_tasks_failed"),
      r4(avg(when(taskEnd, col("duration_ms")))).as("avg_task_duration_ms"),
      r4(sum("input_bytes") / lit(1073741824.0)).as("total_data_processed_gb"),
      coalesce(max("cores").cast("long"), lit(0L)).as("peak_concurrent_executors"),
      min("event_time_us").as("start_date_us"),
      max("event_time_us").as("end_date_us"))

  val crossAppSummaryOracle: String = canonCte + """
SELECT CAST(COUNT(DISTINCT app_id) AS BIGINT) AS total_applications,
       CAST(COUNT(DISTINCT CASE WHEN event_type <> 'SparkListenerApplicationEnd' THEN app_id END) AS BIGINT) AS active_applications,
       CAST(COUNT(*) AS BIGINT) AS total_events,
       CAST(COUNT(CASE WHEN event_type = 'SparkListenerTaskEnd' AND end_reason = 'Success' THEN 1 END) AS BIGINT) AS total_tasks_completed,
       CAST(COUNT(CASE WHEN event_type = 'SparkListenerTaskEnd' AND end_reason <> 'Success' THEN 1 END) AS BIGINT) AS total_tasks_failed,
       FLOOR((AVG(CASE WHEN event_type = 'SparkListenerTaskEnd' THEN duration_ms END)) * 10000.0 + 0.5) / 10000.0 AS avg_task_duration_ms,
       FLOOR((CAST(SUM(input_bytes) AS BIGINT) / 1073741824.0) * 10000.0 + 0.5) / 10000.0 AS total_data_processed_gb,
       CAST(COALESCE(MAX(cores), 0) AS BIGINT) AS peak_concurrent_executors,
       MIN(event_time_us) AS start_date_us,
       MAX(event_time_us) AS end_date_us
FROM canon"""

  /** Per-(app, stage) task counts, duration stats, locality histogram.
   *  Reference: duckdb_store_backup.rs:866-893. */
  def taskDistribution(canon: DataFrame, limit: Int = 1000): DataFrame =
    canon.filter(taskEnd && col("stage_id").isNotNull)
      .groupBy("app_id", "stage_id")
      .agg(
        count(lit(1)).as("total_tasks"),
        count(when(col("end_reason") === "Success", 1)).as("completed_tasks"),
        count(when(col("end_reason") =!= "Success", 1)).as("failed_tasks"),
        r4(avg("duration_ms")).as("avg_duration_ms"),
        min("duration_ms").as("min_duration_ms"),
        max("duration_ms").as("max_duration_ms"),
        count(when(col("locality") === "PROCESS_LOCAL", 1)).as("process_local"),
        count(when(col("locality") === "NODE_LOCAL", 1)).as("node_local"),
        count(when(col("locality") === "RACK_LOCAL", 1)).as("rack_local"),
        count(when(col("locality") === "ANY", 1)).as("any_locality"))
      .orderBy("app_id", "stage_id")
      .limit(limit)

  val taskDistributionOracle: String = canonCte + """
SELECT app_id, stage_id,
       CAST(COUNT(*) AS BIGINT) AS total_tasks,
       CAST(COUNT(CASE WHEN end_reason = 'Success' THEN 1 END) AS BIGINT) AS completed_tasks,
       CAST(COUNT(CASE WHEN end_reason <> 'Success' THEN 1 END) AS BIGINT) AS failed_tasks,
       FLOOR((AVG(duration_ms)) * 10000.0 + 0.5) / 10000.0 AS avg_duration_ms,
       MIN(duration_ms) AS min_duration_ms,
       MAX(duration_ms) AS max_duration_ms,
       CAST(COUNT(CASE WHEN locality = 'PROCESS_LOCAL' THEN 1 END) AS BIGINT) AS process_local,
       CAST(COUNT(CASE WHEN locality = 'NODE_LOCAL' THEN 1 END) AS BIGINT) AS node_local,
       CAST(COUNT(CASE WHEN locality = 'RACK_LOCAL' THEN 1 END) AS BIGINT) AS rack_local,
       CAST(COUNT(CASE WHEN locality = 'ANY' THEN 1 END) AS BIGINT) AS any_locality
FROM canon
WHERE event_type = 'SparkListenerTaskEnd' AND stage_id IS NOT NULL
GROUP BY app_id, stage_id
ORDER BY app_id, stage_id
LIMIT 1000"""

  /** Per-(executor, host) utilization with the served-apps list.
   *  Reference: duckdb_store_backup.rs:939-971. */
  def executorUtilization(canon: DataFrame, limit: Int = 50): DataFrame =
    canon.filter(taskEnd && col("executor_id").isNotNull &&
        col("executor_id") =!= "driver")
      .groupBy("executor_id", "host")
      .agg(
        count(lit(1)).as("total_tasks"),
        sum("duration_ms").as("total_duration_ms"),
        countDistinct("app_id").as("apps_count"),
        count(when(col("locality").isin("PROCESS_LOCAL", "NODE_LOCAL"), 1))
          .as("locality_hits"),
        expr("max(peak_memory_bytes div 1048576)").as("peak_memory_mb"),
        // sort_array: same ascending order (collect_set yields no
        // nulls) without array_sort's interpreted comparator lambda
        array_join(sort_array(collect_set(col("app_id"))), ",").as("apps_served"))
      .orderBy(col("total_tasks").desc, col("executor_id"), col("host"))
      .limit(limit)

  val executorUtilizationOracle: String = canonCte + """
SELECT executor_id, host,
       CAST(COUNT(*) AS BIGINT) AS total_tasks,
       CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms,
       CAST(COUNT(DISTINCT app_id) AS BIGINT) AS apps_count,
       CAST(COUNT(CASE WHEN locality IN ('PROCESS_LOCAL', 'NODE_LOCAL') THEN 1 END) AS BIGINT) AS locality_hits,
       CAST(MAX(peak_memory_bytes // 1048576) AS BIGINT) AS peak_memory_mb,
       array_to_string(list_sort(list_distinct(list(app_id))), ',') AS apps_served
FROM canon
WHERE event_type = 'SparkListenerTaskEnd' AND executor_id IS NOT NULL
  AND executor_id <> 'driver'
GROUP BY executor_id, host
ORDER BY total_tasks DESC, executor_id, host
LIMIT 50"""

  /** Wide per-(app, executor, host) rollup + per-app active flag.
   *  Reference: duckdb_store_backup.rs:1016-1101. */
  def resourceUtilMetrics(canon: DataFrame, limit: Int = 2000): DataFrame = {
    val em = canon.filter(taskEnd)
      .groupBy(
        col("app_id"),
        coalesce(col("executor_id"), lit("driver")).as("executor_id"),
        coalesce(col("host"), lit("localhost")).as("host"))
      .agg(
        count(lit(1)).as("total_tasks"),
        count(when(col("end_reason") === "Success", 1)).as("completed_tasks"),
        count(when(col("end_reason") =!= "Success", 1)).as("failed_tasks"),
        sum("duration_ms").as("total_duration_ms"),
        r4(avg("duration_ms")).as("avg_task_duration_ms"),
        expr("sum(cpu_time_ns) div 1000000").as("cpu_time_ms"),
        coalesce(sum("gc_time_ms"), lit(0L)).as("gc_time_ms"),
        coalesce(expr("max(peak_memory_bytes div 1048576)"), lit(0L)).as("peak_memory_usage_mb"),
        coalesce(expr("max(jvm_heap_bytes div 1048576)"), lit(1024L)).as("max_memory_mb"),
        coalesce(sum("input_bytes"), lit(0L)).as("input_bytes"),
        coalesce(sum("output_bytes"), lit(0L)).as("output_bytes"),
        coalesce(sum("shuffle_read_bytes"), lit(0L)).as("shuffle_read_bytes"),
        coalesce(sum("shuffle_write_bytes"), lit(0L)).as("shuffle_write_bytes"),
        coalesce(sum("disk_spilled_bytes"), lit(0L)).as("disk_spill_bytes"),
        coalesce(sum("memory_spilled_bytes"), lit(0L)).as("memory_spill_bytes"),
        count(when(col("locality") === "PROCESS_LOCAL", 1)).as("data_locality_process_local"),
        count(when(col("locality") === "NODE_LOCAL", 1)).as("data_locality_node_local"),
        count(when(col("locality") === "RACK_LOCAL", 1)).as("data_locality_rack_local"),
        count(when(col("locality") === "ANY", 1)).as("data_locality_any"),
        min("event_time_us").as("start_time_us"),
        max("event_time_us").as("end_time_us"))
      .withColumn("memory_utilization_percent",
        when(col("max_memory_mb") > 0,
          r4(col("peak_memory_usage_mb") * lit(100.0) / col("max_memory_mb")))
          .otherwise(lit(0.0)))

    // Per-app active flag: an app with no ApplicationEnd event is active
    // (reference: duckdb_store_backup.rs:1051-1058). Tiny frame -> AQE
    // broadcasts it.
    val status = canon
      .filter(col("event_type").isin(AppStart, AppEnd))
      .groupBy("app_id")
      .agg(when(count(when(col("event_type") === AppEnd, 1)) > 0, 0L)
        .otherwise(1L).as("status_is_active"))

    em.join(status, Seq("app_id"), "left")
      .withColumn("is_active", coalesce(col("status_is_active"), lit(1L)))
      .drop("status_is_active")
      .select("executor_id", "host", "app_id", "total_tasks",
        "completed_tasks", "failed_tasks", "total_duration_ms",
        "avg_task_duration_ms", "cpu_time_ms", "gc_time_ms",
        "peak_memory_usage_mb", "max_memory_mb", "memory_utilization_percent",
        "input_bytes", "output_bytes", "shuffle_read_bytes",
        "shuffle_write_bytes", "disk_spill_bytes", "memory_spill_bytes",
        "data_locality_process_local", "data_locality_node_local",
        "data_locality_rack_local", "data_locality_any",
        "start_time_us", "end_time_us", "is_active")
      .orderBy("app_id", "executor_id", "host")
      .limit(limit)
  }

  val resourceUtilMetricsOracle: String = canonCte + """
, em AS (
  SELECT app_id,
         COALESCE(executor_id, 'driver') AS executor_id,
         COALESCE(host, 'localhost') AS host,
         CAST(COUNT(*) AS BIGINT) AS total_tasks,
         CAST(COUNT(CASE WHEN end_reason = 'Success' THEN 1 END) AS BIGINT) AS completed_tasks,
         CAST(COUNT(CASE WHEN end_reason <> 'Success' THEN 1 END) AS BIGINT) AS failed_tasks,
         CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms,
         FLOOR((AVG(duration_ms)) * 10000.0 + 0.5) / 10000.0 AS avg_task_duration_ms,
         CAST(SUM(cpu_time_ns) AS BIGINT) // 1000000 AS cpu_time_ms,
         CAST(COALESCE(SUM(gc_time_ms), 0) AS BIGINT) AS gc_time_ms,
         CAST(COALESCE(MAX(peak_memory_bytes // 1048576), 0) AS BIGINT) AS peak_memory_usage_mb,
         CAST(COALESCE(MAX(jvm_heap_bytes // 1048576), 1024) AS BIGINT) AS max_memory_mb,
         CAST(COALESCE(SUM(input_bytes), 0) AS BIGINT) AS input_bytes,
         CAST(COALESCE(SUM(output_bytes), 0) AS BIGINT) AS output_bytes,
         CAST(COALESCE(SUM(shuffle_read_bytes), 0) AS BIGINT) AS shuffle_read_bytes,
         CAST(COALESCE(SUM(shuffle_write_bytes), 0) AS BIGINT) AS shuffle_write_bytes,
         CAST(COALESCE(SUM(disk_spilled_bytes), 0) AS BIGINT) AS disk_spill_bytes,
         CAST(COALESCE(SUM(memory_spilled_bytes), 0) AS BIGINT) AS memory_spill_bytes,
         CAST(COUNT(CASE WHEN locality = 'PROCESS_LOCAL' THEN 1 END) AS BIGINT) AS data_locality_process_local,
         CAST(COUNT(CASE WHEN locality = 'NODE_LOCAL' THEN 1 END) AS BIGINT) AS data_locality_node_local,
         CAST(COUNT(CASE WHEN locality = 'RACK_LOCAL' THEN 1 END) AS BIGINT) AS data_locality_rack_local,
         CAST(COUNT(CASE WHEN locality = 'ANY' THEN 1 END) AS BIGINT) AS data_locality_any,
         MIN(event_time_us) AS start_time_us,
         MAX(event_time_us) AS end_time_us
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
  GROUP BY app_id, COALESCE(executor_id, 'driver'), COALESCE(host, 'localhost')),
status AS (
  SELECT app_id,
         CAST(CASE WHEN COUNT(CASE WHEN event_type = 'SparkListenerApplicationEnd' THEN 1 END) > 0
                   THEN 0 ELSE 1 END AS BIGINT) AS status_is_active
  FROM canon
  WHERE event_type IN ('SparkListenerApplicationStart', 'SparkListenerApplicationEnd')
  GROUP BY app_id)
SELECT em.executor_id, em.host, em.app_id, em.total_tasks,
       em.completed_tasks, em.failed_tasks, em.total_duration_ms,
       em.avg_task_duration_ms, em.cpu_time_ms, em.gc_time_ms,
       em.peak_memory_usage_mb, em.max_memory_mb,
       CASE WHEN em.max_memory_mb > 0
            THEN FLOOR((em.peak_memory_usage_mb * 100.0 / em.max_memory_mb) * 10000.0 + 0.5) / 10000.0
            ELSE 0.0 END AS memory_utilization_percent,
       em.input_bytes, em.output_bytes, em.shuffle_read_bytes,
       em.shuffle_write_bytes, em.disk_spill_bytes, em.memory_spill_bytes,
       em.data_locality_process_local, em.data_locality_node_local,
       em.data_locality_rack_local, em.data_locality_any,
       em.start_time_us, em.end_time_us,
       COALESCE(status.status_is_active, 1) AS is_active
FROM em LEFT JOIN status ON em.app_id = status.app_id
ORDER BY em.app_id, em.executor_id, em.host
LIMIT 2000"""

  /** Concurrently-active applications per calendar day — the
   *  capacity-planning number behind `capacity_trends`' volume
   *  rollups: not "how many apps logged events on day D" but "how
   *  many app LIFETIMES overlapped day D", counting apps that span a
   *  day silently (long-running apps emitting nothing on a quiet
   *  day). The overlap join is the genuine
   *  [[graft.operators.RangeJoin]] case: day-start points against
   *  app-lifetime intervals with NO equi-key (every interval would
   *  hit every day in a naive plan), so the banded blocking — day
   *  points project to one 24h bucket, app intervals explode to the
   *  O(lifetime-days) buckets they span — is exactly what bounds the
   *  work at fleet scale. The interval start is floored to its day so
   *  point-in-interval containment coincides with day-overlap.
   *  COUNT(*) (not DISTINCT) is deliberate: each (day, app) pair
   *  meets in exactly one bucket, and the oracle's independently-
   *  planned BETWEEN join would expose any duplicate. */
  def appDailyActive(canon: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val ev = canon.filter(col("event_time_us").isNotNull)
      .select("app_id", "event_time_us", "event_date")
    val days = ev.select(col("event_date"),
        expr(s"(event_time_us div $dayUs) * $dayUs").as("day_us"))
      .distinct()
    val apps = ev.groupBy("app_id").agg(
        min("event_time_us").as("a_start"), max("event_time_us").as("a_end"))
      .select(col("app_id"),
        expr(s"(a_start div $dayUs) * $dayUs").as("life_start_us"),
        col("a_end").as("life_end_us"))
    graft.operators.RangeJoin.rangeJoin(days, apps, keys = Seq.empty,
        tsCol = "day_us", startCol = "life_start_us", endCol = "life_end_us",
        bucketWidth = dayUs)
      .groupBy("event_date").agg(count(lit(1)).as("n_active_apps"))
      .orderBy("event_date")
  }

  /** DuckDB plans the BETWEEN join natively — an independent
   *  implementation of the same overlap semantics. */
  val appDailyActiveOracle: String = canonCte + """,
ev AS (
  SELECT app_id, event_time_us, event_date
  FROM canon WHERE event_time_us IS NOT NULL),
days AS (
  SELECT DISTINCT event_date,
         (event_time_us // 86400000000) * 86400000000 AS day_us
  FROM ev),
apps AS (
  SELECT app_id,
         (MIN(event_time_us) // 86400000000) * 86400000000 AS life_start_us,
         MAX(event_time_us) AS life_end_us
  FROM ev GROUP BY app_id)
SELECT d.event_date, CAST(COUNT(*) AS BIGINT) AS n_active_apps
FROM days d JOIN apps a
  ON d.day_us BETWEEN a.life_start_us AND a.life_end_us
GROUP BY d.event_date
ORDER BY d.event_date"""

  /** App lifecycle funnel: of the apps that emitted an
   *  ApplicationStart, how many reached a first JobStart at-or-after
   *  it, and of those how many reached a first successful TaskEnd
   *  at-or-after that job — plus the mean start→job latency of the
   *  converting apps. The one-row readout a platform team watches for
   *  "submitted but never scheduled work" regressions.
   *
   *  Scale shape: ONE partial-aggregating `groupBy(app_id)` pass
   *  (three conditional `min`s — |apps| rows shuffled, not |events|),
   *  then a one-row rollup. All comparisons are integer epoch-micros;
   *  the single double (mean latency) is a final projection. */
  def appFunnel(canon: DataFrame): DataFrame = {
    val perApp = canon
      .filter(col("event_time_us").isNotNull)
      .groupBy("app_id").agg(
        min(when(col("event_type") === AppStart, col("event_time_us")))
          .as("t_start"),
        min(when(col("event_type") === JobStart, col("event_time_us")))
          .as("t_job"),
        min(when(taskEnd && col("end_reason") === "Success",
          col("event_time_us"))).as("t_task"))
    val started = col("t_start").isNotNull
    val job     = started && col("t_job") >= col("t_start")
    val task    = job && col("t_task") >= col("t_job")
    perApp.agg(
      count(when(started, 1)).as("apps_started"),
      count(when(job, 1)).as("apps_with_job"),
      count(when(task, 1)).as("apps_with_task"),
      sum(when(job, col("t_job") - col("t_start"))).as("sum_start_to_job_us"))
      .select(
        col("apps_started"), col("apps_with_job"), col("apps_with_task"),
        expr("(apps_with_job * 1000) div apps_started").as("job_conv_pm"),
        expr("(apps_with_task * 1000) div apps_started").as("task_conv_pm"),
        r4(col("sum_start_to_job_us") * 1.0 / col("apps_with_job") / 1000.0)
          .as("avg_start_to_job_ms"))
  }

  val appFunnelOracle: String = canonCte + """,
per_app AS (
  SELECT app_id,
         MIN(CASE WHEN event_type = 'SparkListenerApplicationStart' THEN event_time_us END) AS t_start,
         MIN(CASE WHEN event_type = 'SparkListenerJobStart' THEN event_time_us END) AS t_job,
         MIN(CASE WHEN event_type = 'SparkListenerTaskEnd' AND end_reason = 'Success' THEN event_time_us END) AS t_task
  FROM canon WHERE event_time_us IS NOT NULL
  GROUP BY app_id),
f AS (
  SELECT CAST(COUNT(CASE WHEN t_start IS NOT NULL THEN 1 END) AS BIGINT) AS apps_started,
         CAST(COUNT(CASE WHEN t_job >= t_start THEN 1 END) AS BIGINT) AS apps_with_job,
         CAST(COUNT(CASE WHEN t_job >= t_start AND t_task >= t_job THEN 1 END) AS BIGINT) AS apps_with_task,
         CAST(SUM(CASE WHEN t_job >= t_start THEN t_job - t_start END) AS BIGINT) AS sum_start_to_job_us
  FROM per_app)
SELECT apps_started, apps_with_job, apps_with_task,
       apps_with_job * 1000 // apps_started AS job_conv_pm,
       apps_with_task * 1000 // apps_started AS task_conv_pm,
       FLOOR((sum_start_to_job_us * 1.0 / apps_with_job / 1000.0) * 10000.0 + 0.5) / 10000.0 AS avg_start_to_job_ms
FROM f"""

  /** Weekly cohort retention over app ids: apps first seen in epoch
   *  week W that were still emitting events k weeks later — the
   *  recurring-workload survival matrix (a nightly job shows up in
   *  every offset column; one-shot backfills die at offset 0). Weeks
   *  are integer epoch-day div 7 (no calendar functions, identical
   *  floor arithmetic in both engines).
   *
   *  Scale shape: distinct (app_id, week) first (the only
   *  event-cardinality shuffle), one `groupBy(app_id)` for the
   *  cohort, a co-partitioned app-keyed join, and a weeks²-bounded
   *  rollup; cohort sizes broadcast back onto the matrix. */
  def appRetention(canon: DataFrame): DataFrame = {
    val weeks = canon
      .filter(col("event_time_us").isNotNull)
      .select(col("app_id"),
        expr("(event_time_us div 86400000000) div 7").as("week"))
      .distinct()
    val cohort = weeks.groupBy("app_id").agg(min("week").as("cohort_week"))
    val cells = weeks.join(cohort, "app_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_apps"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("active_apps"),
        col("cohort_size"),
        expr("(active_apps * 1000) div cohort_size").as("retained_pm"))
      .orderBy("cohort_week", "week_offset")
  }

  val appRetentionOracle: String = canonCte + """,
weeks AS (
  SELECT DISTINCT app_id, (event_time_us // 86400000000) // 7 AS week
  FROM canon WHERE event_time_us IS NOT NULL),
cohort AS (
  SELECT app_id, MIN(week) AS cohort_week FROM weeks GROUP BY app_id),
cells AS (
  SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
         CAST(COUNT(*) AS BIGINT) AS active_apps
  FROM weeks w JOIN cohort c ON w.app_id = c.app_id
  GROUP BY c.cohort_week, w.week - c.cohort_week),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM cohort GROUP BY cohort_week)
SELECT ce.cohort_week, ce.week_offset, ce.active_apps, s.cohort_size,
       ce.active_apps * 1000 // s.cohort_size AS retained_pm
FROM cells ce JOIN sizes s ON ce.cohort_week = s.cohort_week
ORDER BY ce.cohort_week, ce.week_offset"""

  /** Fleet-level app-DURATION distribution — the SLA one-liner next
   *  to the per-app `task_quantiles` strips: how long apps run across
   *  the whole store (nearest-rank p50/p90 + max over per-app
   *  wall-clock spans, `app_list`'s min/max event-time semantics).
   *  Shape: one app-keyed partial agg to |apps| rows, then the
   *  histogram-rank discipline ([[graft.pipeline.TextAnalysis
   *  .surprisalBuckets]], SURVEY §4): the spans collapse to a
   *  per-duration_ms HISTOGRAM before the (necessarily global)
   *  cumulative window, so the single-partition step sees at most
   *  |distinct ms values| rows, never one row per app — integer
   *  microseconds end-to-end. */
  def appDurationQuantiles(canon: DataFrame): DataFrame = {
    val spans = canon.groupBy("app_id")
      .agg(expr("(max(event_time_us) - min(event_time_us)) div 1000")
        .as("duration_ms"))
    val hist = spans.groupBy("duration_ms").agg(count(lit(1)).as("cnt"))
    val cum = HistogramRank.cumulate(hist, Seq.empty, "duration_ms")
    def at(p: Double) = HistogramRank.at("duration_ms", p)
    cum.agg(
      max("n").as("n_apps"),
      at(0.5).as("p50_duration_ms"),
      at(0.9).as("p90_duration_ms"),
      max("duration_ms").as("max_duration_ms"))
  }

  val appDurationQuantilesOracle: String = canonCte + """
, spans AS (
  SELECT app_id,
         CAST((MAX(event_time_us) - MIN(event_time_us)) // 1000 AS BIGINT) AS duration_ms
  FROM canon GROUP BY app_id),
hist AS (
  SELECT duration_ms, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM spans GROUP BY duration_ms),
""" + HistogramRank.cumCteSql("hist", Seq.empty, "duration_ms") + s"""
SELECT CAST(MAX(n) AS BIGINT) AS n_apps,
       ${HistogramRank.pickSql("duration_ms", 0.5, "p50_duration_ms")},
       ${HistogramRank.pickSql("duration_ms", 0.9, "p90_duration_ms")},
       MAX(duration_ms) AS max_duration_ms
FROM cum"""
}
