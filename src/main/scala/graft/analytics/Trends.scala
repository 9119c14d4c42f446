package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Round.r4
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte

/**
 * Daily trend analytics over TaskEnd events.
 *
 * Reference behavior:
 *  - performance trends: src/storage/duckdb_store_backup.rs:488-547
 *  - GC-time trends: src/storage/duckdb_store_backup.rs:549-614
 *  - CPU-utilization analysis: src/storage/duckdb_store_backup.rs:616-697
 *  - memory-usage analysis: src/storage/duckdb_store_backup.rs:699-799
 *  - capacity usage trends: src/storage/duckdb_store_backup.rs:1363-1427
 *
 * All are single `groupBy().agg()` passes (map-side partial aggregation);
 * sums run over integer columns so cross-engine results are exact, and
 * ratios are computed once from the exact sums.
 */
object Trends {

  private val taskEnd = col("event_type") === TaskEnd

  /** Optional [minDate, maxDate] window (ISO `yyyy-MM-dd`, inclusive) —
   *  the reference's `AnalyticsQuery.start_date`/`end_date` params
   *  (reference: src/analytics_api.rs:36-45). A plain predicate on
   *  `event_date`: over a [[graft.sources.EventLogSource.writeStore]]
   *  store it is a PARTITION filter (whole day-directories pruned
   *  before any IO — asserted in PlanAuditSpec); over the raw frame it
   *  is an ordinary pushed/codegen'd filter. */
  private def dateWindow(canon: DataFrame, minDate: Option[String],
                         maxDate: Option[String]): DataFrame = {
    val filters = minDate.map(d => col("event_date") >= d) ++
                  maxDate.map(d => col("event_date") <= d)
    filters.foldLeft(canon)(_ filter _)
  }

  /** Daily per-app task aggregates. Reference: duckdb_store_backup.rs:494-513. */
  def perfTrends(canon: DataFrame, limit: Int = 1000,
                 minDate: Option[String] = None,
                 maxDate: Option[String] = None): DataFrame =
    dateWindow(canon, minDate, maxDate).filter(taskEnd)
      .groupBy(col("event_date").as("date"), col("app_id"))
      .agg(
        r4(avg("duration_ms")).as("avg_task_duration_ms"),
        count(lit(1)).as("total_tasks"),
        sum(when(col("end_reason") =!= "Success", 1L).otherwise(0L)).as("failed_tasks"),
        r4(avg("input_bytes")).as("avg_input_bytes"),
        r4(avg("output_bytes")).as("avg_output_bytes"))
      .orderBy(col("date").desc, col("app_id"))
      .limit(limit)

  /** Oracle for the date-windowed variant (harness pins the window to
   *  2024-01-08..2024-01-18). */
  val perfTrendsWindowOracle: String = canonCte + """
SELECT event_date AS date, app_id,
       FLOOR((AVG(duration_ms)) * 10000.0 + 0.5) / 10000.0 AS avg_task_duration_ms,
       CAST(COUNT(*) AS BIGINT) AS total_tasks,
       CAST(SUM(CASE WHEN end_reason <> 'Success' THEN 1 ELSE 0 END) AS BIGINT) AS failed_tasks,
       FLOOR((AVG(input_bytes)) * 10000.0 + 0.5) / 10000.0 AS avg_input_bytes,
       FLOOR((AVG(output_bytes)) * 10000.0 + 0.5) / 10000.0 AS avg_output_bytes
FROM canon
WHERE event_type = 'SparkListenerTaskEnd'
  AND event_date >= '2024-01-08' AND event_date <= '2024-01-18'
GROUP BY event_date, app_id
ORDER BY date DESC, app_id
LIMIT 1000"""

  val perfTrendsOracle: String = canonCte + """
SELECT event_date AS date, app_id,
       FLOOR((AVG(duration_ms)) * 10000.0 + 0.5) / 10000.0 AS avg_task_duration_ms,
       CAST(COUNT(*) AS BIGINT) AS total_tasks,
       CAST(SUM(CASE WHEN end_reason <> 'Success' THEN 1 ELSE 0 END) AS BIGINT) AS failed_tasks,
       FLOOR((AVG(input_bytes)) * 10000.0 + 0.5) / 10000.0 AS avg_input_bytes,
       FLOOR((AVG(output_bytes)) * 10000.0 + 0.5) / 10000.0 AS avg_output_bytes
FROM canon
WHERE event_type = 'SparkListenerTaskEnd'
GROUP BY event_date, app_id
ORDER BY date DESC, app_id
LIMIT 1000"""

  /** Daily per-app GC totals. Reference: duckdb_store_backup.rs:556-575. */
  def gcTrends(canon: DataFrame, limit: Int = 1000,
               minDate: Option[String] = None,
               maxDate: Option[String] = None): DataFrame =
    dateWindow(canon, minDate, maxDate).filter(taskEnd)
      .groupBy(col("event_date").as("date"), col("app_id"))
      .agg(
        coalesce(sum("gc_time_ms"), lit(0L)).as("total_gc_time_ms"),
        r4(coalesce(avg("gc_time_ms"), lit(0.0))).as("avg_gc_time_ms"),
        count(lit(1)).as("total_tasks"))
      .withColumn("gc_time_per_task_ms",
        r4(col("total_gc_time_ms") * lit(1.0) / col("total_tasks")))
      .orderBy(col("date").desc, col("app_id"))
      .limit(limit)

  val gcTrendsOracle: String = canonCte + """
SELECT event_date AS date, app_id,
       CAST(COALESCE(SUM(gc_time_ms), 0) AS BIGINT) AS total_gc_time_ms,
       FLOOR((COALESCE(AVG(gc_time_ms), 0)) * 10000.0 + 0.5) / 10000.0 AS avg_gc_time_ms,
       CAST(COUNT(*) AS BIGINT) AS total_tasks,
       FLOOR((CAST(COALESCE(SUM(gc_time_ms), 0) AS BIGINT) * 1.0 / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS gc_time_per_task_ms
FROM canon
WHERE event_type = 'SparkListenerTaskEnd'
GROUP BY event_date, app_id
ORDER BY date DESC, app_id
LIMIT 1000"""

  /** Actual vs theoretical CPU time per (day, app, executor) + rating.
   *  Reference: duckdb_store_backup.rs:623-697. The reference divides
   *  each task's CPU ns by 1e6 before summing; graft sums the exact ns
   *  and divides once — deterministic at any parallelism. */
  def cpuUtil(canon: DataFrame, limit: Int = 2000,
              minDate: Option[String] = None,
              maxDate: Option[String] = None): DataFrame =
    dateWindow(canon, minDate, maxDate).filter(taskEnd)
      .groupBy(col("event_date").as("date"), col("app_id"),
        coalesce(col("executor_id"), lit("driver")).as("executor_id"))
      .agg(
        count(lit(1)).as("total_tasks"),
        sum("duration_ms").as("total_duration_ms"),
        expr("sum(cpu_time_ns) div 1000000").as("actual_cpu_time_ms"))
      .withColumn("theoretical_cpu_time_ms", col("total_duration_ms"))
      .withColumn("idle_cpu_time_ms",
        greatest(col("theoretical_cpu_time_ms") - col("actual_cpu_time_ms"), lit(0L)))
      .withColumn("cpu_utilization_percent",
        when(col("theoretical_cpu_time_ms") > 0,
          r4(col("actual_cpu_time_ms") * lit(100.0) / col("theoretical_cpu_time_ms"))))
      .withColumn("efficiency_rating",
        when(col("theoretical_cpu_time_ms") <= 0, "Unknown")
          .when(col("actual_cpu_time_ms") * lit(100.0) / col("theoretical_cpu_time_ms") >= 80.0, "High")
          .when(col("actual_cpu_time_ms") * lit(100.0) / col("theoretical_cpu_time_ms") >= 50.0, "Medium")
          .otherwise("Low"))
      .orderBy(col("date").desc, col("app_id"), col("executor_id"))
      .limit(limit)

  val cpuUtilOracle: String = canonCte + """
, g AS (
  SELECT event_date AS date, app_id,
         COALESCE(executor_id, 'driver') AS executor_id,
         CAST(COUNT(*) AS BIGINT) AS total_tasks,
         CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms,
         CAST(SUM(cpu_time_ns) AS BIGINT) // 1000000 AS actual_cpu_time_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
  GROUP BY event_date, app_id, COALESCE(executor_id, 'driver'))
SELECT date, app_id, executor_id, total_tasks, total_duration_ms,
       actual_cpu_time_ms,
       total_duration_ms AS theoretical_cpu_time_ms,
       GREATEST(total_duration_ms - actual_cpu_time_ms, 0) AS idle_cpu_time_ms,
       CASE WHEN total_duration_ms > 0
            THEN FLOOR((actual_cpu_time_ms * 100.0 / total_duration_ms) * 10000.0 + 0.5) / 10000.0 END AS cpu_utilization_percent,
       CASE WHEN total_duration_ms <= 0 THEN 'Unknown'
            WHEN actual_cpu_time_ms * 100.0 / total_duration_ms >= 80.0 THEN 'High'
            WHEN actual_cpu_time_ms * 100.0 / total_duration_ms >= 50.0 THEN 'Medium'
            ELSE 'Low' END AS efficiency_rating
FROM g
ORDER BY date DESC, app_id, executor_id
LIMIT 2000"""

  /** Memory usage + spill per (day, app, executor) with efficiency
   *  rating. Reference: duckdb_store_backup.rs:705-741 (rating logic
   *  from the Rust post-processing at :758-775). */
  def memUsage(canon: DataFrame, limit: Int = 2000,
               minDate: Option[String] = None,
               maxDate: Option[String] = None): DataFrame =
    dateWindow(canon, minDate, maxDate).filter(taskEnd)
      .groupBy(col("event_date").as("date"), col("app_id"),
        coalesce(col("executor_id"), lit("driver")).as("executor_id"))
      .agg(
        count(lit(1)).as("total_tasks"),
        coalesce(expr("max(jvm_heap_bytes div 1048576)"), lit(1024L)).as("max_memory_mb"),
        coalesce(expr("max(peak_memory_bytes div 1048576)"), lit(0L)).as("peak_memory_usage_mb"),
        r4(coalesce(expr("avg(peak_memory_bytes div 1048576)"), lit(0.0))).as("avg_memory_usage_mb"),
        coalesce(expr("sum(memory_spilled_bytes div 1048576)"), lit(0L)).as("memory_spill_mb"),
        coalesce(expr("sum(disk_spilled_bytes div 1048576)"), lit(0L)).as("disk_spill_mb"))
      .withColumn("memory_utilization_percent",
        when(col("max_memory_mb") > 0,
          r4(col("peak_memory_usage_mb") * lit(100.0) / col("max_memory_mb")))
          .otherwise(lit(0.0)))
      .withColumn("spill_ratio",
        when(col("peak_memory_usage_mb") > 0,
          r4(col("memory_spill_mb") * lit(1.0) / col("peak_memory_usage_mb"))))
      .withColumn("memory_efficiency_rating", {
        val util = col("peak_memory_usage_mb") * lit(100.0) / col("max_memory_mb")
        when(col("memory_spill_mb") === 0 && util < 70.0, "Excellent")
          .when(col("memory_spill_mb") === 0, "Good")
          .when(util > 95.0 && col("memory_spill_mb") > 100, "Critical")
          .otherwise("Poor")
      })
      .select("date", "app_id", "executor_id", "max_memory_mb",
        "peak_memory_usage_mb", "avg_memory_usage_mb",
        "memory_utilization_percent", "memory_spill_mb", "disk_spill_mb",
        "total_tasks", "memory_efficiency_rating", "spill_ratio")
      .orderBy(col("date").desc, col("app_id"), col("executor_id"))
      .limit(limit)

  val memUsageOracle: String = canonCte + """
, g AS (
  SELECT event_date AS date, app_id,
         COALESCE(executor_id, 'driver') AS executor_id,
         CAST(COUNT(*) AS BIGINT) AS total_tasks,
         CAST(COALESCE(MAX(jvm_heap_bytes // 1048576), 1024) AS BIGINT) AS max_memory_mb,
         CAST(COALESCE(MAX(peak_memory_bytes // 1048576), 0) AS BIGINT) AS peak_memory_usage_mb,
         FLOOR((COALESCE(AVG(peak_memory_bytes // 1048576), 0)) * 10000.0 + 0.5) / 10000.0 AS avg_memory_usage_mb,
         CAST(COALESCE(SUM(memory_spilled_bytes // 1048576), 0) AS BIGINT) AS memory_spill_mb,
         CAST(COALESCE(SUM(disk_spilled_bytes // 1048576), 0) AS BIGINT) AS disk_spill_mb
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
  GROUP BY event_date, app_id, COALESCE(executor_id, 'driver'))
SELECT date, app_id, executor_id, max_memory_mb, peak_memory_usage_mb,
       avg_memory_usage_mb,
       CASE WHEN max_memory_mb > 0
            THEN FLOOR((peak_memory_usage_mb * 100.0 / max_memory_mb) * 10000.0 + 0.5) / 10000.0
            ELSE 0.0 END AS memory_utilization_percent,
       memory_spill_mb, disk_spill_mb, total_tasks,
       CASE WHEN memory_spill_mb = 0 AND peak_memory_usage_mb * 100.0 / max_memory_mb < 70.0 THEN 'Excellent'
            WHEN memory_spill_mb = 0 THEN 'Good'
            WHEN peak_memory_usage_mb * 100.0 / max_memory_mb > 95.0 AND memory_spill_mb > 100 THEN 'Critical'
            ELSE 'Poor' END AS memory_efficiency_rating,
       CASE WHEN peak_memory_usage_mb > 0
            THEN FLOOR((memory_spill_mb * 1.0 / peak_memory_usage_mb) * 10000.0 + 0.5) / 10000.0 END AS spill_ratio
FROM g
ORDER BY date DESC, app_id, executor_id
LIMIT 2000"""

  /** Daily corpus-level capacity rollup.
   *  Reference: duckdb_store_backup.rs:1369-1398. */
  def capacityTrends(canon: DataFrame, limit: Int = 30,
                     minDate: Option[String] = None,
                     maxDate: Option[String] = None): DataFrame =
    dateWindow(canon, minDate, maxDate).filter(taskEnd)
      .groupBy(col("event_date").as("date"))
      .agg(
        sum("peak_memory_bytes").as("peak_sum"),
        countDistinct("app_id").as("concurrent_apps"),
        count(lit(1)).as("total_tasks"),
        avg("cpu_time_ns").as("avg_cpu_ns"))
      .select(
        col("date"),
        r4(col("peak_sum") / lit(1073741824.0)).as("total_memory_gb_used"),
        r4((col("avg_cpu_ns") / lit(1000000000.0)) * col("concurrent_apps"))
          .as("total_cpu_cores_used"),
        col("concurrent_apps").as("peak_concurrent_applications"),
        col("total_tasks"),
        r4(col("peak_sum") / lit(1073741824.0) / col("concurrent_apps"))
          .as("average_resource_utilization"),
        r4(least(lit(100.0),
          col("peak_sum") / lit(1073741824.0) / lit(1024.0) * lit(100.0)))
          .as("cluster_capacity_percentage"))
      .orderBy(col("date").desc)
      .limit(limit)

  /** Weekly usage heatmap: event volume, distinct apps, and task-time
   *  mass per (day-of-week, hour-of-day) cell — the when-do-we-run
   *  view capacity planning reads next to `capacity_trends`' daily
   *  series (a flat daily total can hide a 9am Monday spike that sets
   *  the real provisioning floor). Day-of-week is pure integer
   *  arithmetic over epoch-micros — `(days_since_epoch + 4) % 7`,
   *  0 = Sunday — because engine dow() functions disagree on week
   *  origin (Spark 1=Sunday, DuckDB 0=Sunday) and the integer form is
   *  identical everywhere. One map-side-combining aggregate to a
   *  fixed 7×24 cell frame. */
  def usageHeatmap(canon: DataFrame): DataFrame =
    canon.select(
        expr("(event_time_us div 86400000000 + 4) % 7").as("dow"),
        expr("(event_time_us div 3600000000) % 24").as("hour"),
        col("app_id"), col("duration_ms"))
      .groupBy("dow", "hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("app_id").as("n_apps"),
        sum(coalesce(col("duration_ms"), lit(0L))).as("task_ms"))
      .orderBy("dow", "hour")

  /** Event-rate ANOMALY detection — the ops alarm a history server
   *  feeds a monitoring stack: per hour, the event count vs the
   *  trailing `windowHours` mean, flagged a spike when it clears
   *  mean + 3σ (a runaway retry loop, a stuck listener re-emitting,
   *  or a burst deploy shows up here before any per-app view). The
   *  3σ test is cross-multiplied so no square root enters:
   *  `(cnt·n − s1)² > 9·(n·s2 − s1²)` with the products taken in
   *  DOUBLE on both engines — hourly counts at 100 TB (~1e10/h)
   *  square past 2⁶³, and Spark's wrapping long overflow vs DuckDB's
   *  HUGEINT promotion would otherwise disagree; identical IEEE
   *  expressions agree bit-for-bit. Shape: the corpus collapses to
   *  the bounded hourly aggregate FIRST; the trailing window runs
   *  over |hours| rows only (quality_sweep discipline). */
  def eventRateAnomalies(canon: DataFrame, windowHours: Int = 24,
                         minPrior: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = canon
      .select(expr("event_time_us div 3600000000").as("hour_id"))
      .groupBy("hour_id").agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy("hour_id").rowsBetween(-windowHours, -1)
    val dev = col("n_events").cast("double") * col("n_prior") - col("s1")
    hourly
      .withColumn("n_prior", count(col("n_events")).over(w))
      .withColumn("s1", coalesce(sum("n_events").over(w), lit(0L)))
      .withColumn("s2",
        // squared BEFORE summing in DOUBLE: 1e10 events/hour squares
        // past 2^63 (wrapping long vs HUGEINT would diverge); below
        // 2^53 every double add is exact, so the oracle stays bit-equal
        coalesce(sum(col("n_events").cast("double") * col("n_events"))
          .over(w), lit(0.0)))
      .select(col("hour_id"), col("n_events"), col("n_prior"),
        when(col("n_prior") === 0L, lit(0.0))
          .otherwise(r4(col("s1") * lit(1.0) / col("n_prior")))
          .as("mean_prior"),
        (col("n_prior") >= minPrior.toLong && dev > 0.0 &&
          dev * dev > lit(9.0) * (col("n_prior").cast("double") * col("s2")
            - col("s1").cast("double") * col("s1")))
          .cast("long").as("is_spike"))
      .orderBy("hour_id")
  }

  val eventRateAnomaliesOracle: String = canonCte + """
, hourly AS (
  SELECT event_time_us // 3600000000 AS hour_id,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM canon GROUP BY event_time_us // 3600000000),
win AS (
  SELECT hour_id, n_events,
         CAST(COUNT(n_events) OVER w AS BIGINT) AS n_prior,
         CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS s1,
         CAST(COALESCE(SUM(CAST(n_events AS DOUBLE) * n_events) OVER w, 0) AS DOUBLE) AS s2
  FROM hourly
  WINDOW w AS (ORDER BY hour_id ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT CAST(hour_id AS BIGINT) AS hour_id, n_events, n_prior,
       CASE WHEN n_prior = 0 THEN 0.0
            ELSE FLOOR((s1 * 1.0 / n_prior) * 10000.0 + 0.5) / 10000.0 END AS mean_prior,
       CAST(CASE WHEN n_prior >= 6
                  AND CAST(n_events AS DOUBLE) * n_prior - s1 > 0.0
                  AND (CAST(n_events AS DOUBLE) * n_prior - s1)
                      * (CAST(n_events AS DOUBLE) * n_prior - s1)
                      > 9.0 * (CAST(n_prior AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
             THEN 1 ELSE 0 END AS BIGINT) AS is_spike
FROM win ORDER BY hour_id"""

  /** Event-TYPE-mix drift, day over day — the composition alarm next
   *  to [[eventRateAnomalies]]' volume alarm: a fleet whose emitter
   *  changed (a Spark upgrade adding listener events, a stuck stage
   *  flooding TaskEnd, a listener dropping a type) can keep a flat
   *  total rate while its event-type MIX shifts, which is exactly
   *  what a downstream parser breaks on. Per consecutive calendar-day
   *  pair: the total-variation distance between the two days'
   *  event-type share distributions (shares in integer ppm —
   *  `cnt · 1e6 div day_total` — so the L1 sum is exact under any
   *  aggregation order; TVD = L1/2 surfaces as an r4 double), the
   *  count of types that appeared/disappeared, and a shift flag at
   *  TVD > 0.05 (the alarm default a deployment tunes).
   *
   *  Shape: the corpus collapses to the (day, type) aggregate FIRST
   *  (map-side combine); the share window, day-pair lag, and the
   *  |days|×|types| comparison grid all run over that bounded frame
   *  — nothing downstream of the first groupBy touches corpus
   *  cardinality. */
  def eventMixDrift(canon: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shares = canon
      .groupBy(col("event_date").as("date"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("day_total", sum("cnt").over(Window.partitionBy("date")))
      .withColumn("share_ppm", expr("cnt * 1000000 div day_total"))
      .select("date", "event_type", "share_ppm")
    val pairs = shares.select("date").distinct()
      .withColumn("prev_date", lag("date", 1).over(Window.orderBy("date")))
      .filter(col("prev_date").isNotNull)
    val grid = pairs.crossJoin(
      broadcast(shares.select("event_type").distinct()))
    grid
      .join(shares.select(col("date"), col("event_type"),
        col("share_ppm").as("cur_ppm")), Seq("date", "event_type"), "left")
      .join(shares.select(col("date").as("prev_date"), col("event_type"),
        col("share_ppm").as("prev_ppm")), Seq("prev_date", "event_type"), "left")
      .groupBy("date", "prev_date")
      .agg(
        sum(abs(coalesce(col("cur_ppm"), lit(0L))
          - coalesce(col("prev_ppm"), lit(0L)))).as("l1_ppm"),
        sum(when(col("cur_ppm").isNotNull && col("prev_ppm").isNull, 1L)
          .otherwise(0L)).as("n_types_added"),
        sum(when(col("prev_ppm").isNotNull && col("cur_ppm").isNull, 1L)
          .otherwise(0L)).as("n_types_dropped"))
      .select(col("date"), col("prev_date"), col("l1_ppm"),
        r4(col("l1_ppm") / lit(2000000.0)).as("tvd"),
        col("n_types_added"), col("n_types_dropped"),
        when(col("l1_ppm") > 100000L, 1L).otherwise(0L).as("is_shift"))
      .orderBy("date")
  }

  val eventMixDriftOracle: String = canonCte + """
, daily AS (
  SELECT event_date AS date, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM canon GROUP BY event_date, event_type),
shares AS (
  SELECT date, event_type,
         CAST(cnt * 1000000 // (SUM(cnt) OVER (PARTITION BY date)) AS BIGINT) AS share_ppm
  FROM daily),
pairs AS (
  SELECT date, prev_date FROM (
    SELECT date, LAG(date) OVER (ORDER BY date) AS prev_date
    FROM (SELECT DISTINCT date FROM shares))
  WHERE prev_date IS NOT NULL),
grid AS (
  SELECT p.date, p.prev_date, t.event_type
  FROM pairs p CROSS JOIN (SELECT DISTINCT event_type FROM shares) t),
j AS (
  SELECT g.date, g.prev_date,
         c.share_ppm AS cur_ppm, pv.share_ppm AS prev_ppm
  FROM grid g
  LEFT JOIN shares c ON c.date = g.date AND c.event_type = g.event_type
  LEFT JOIN shares pv ON pv.date = g.prev_date AND pv.event_type = g.event_type)
SELECT date, prev_date,
       CAST(SUM(ABS(COALESCE(cur_ppm, 0) - COALESCE(prev_ppm, 0))) AS BIGINT) AS l1_ppm,
       FLOOR((SUM(ABS(COALESCE(cur_ppm, 0) - COALESCE(prev_ppm, 0))) / 2000000.0)
             * 10000.0 + 0.5) / 10000.0 AS tvd,
       CAST(SUM(CASE WHEN cur_ppm IS NOT NULL AND prev_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_types_added,
       CAST(SUM(CASE WHEN prev_ppm IS NOT NULL AND cur_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_types_dropped,
       CAST(CASE WHEN SUM(ABS(COALESCE(cur_ppm, 0) - COALESCE(prev_ppm, 0))) > 100000
                 THEN 1 ELSE 0 END AS BIGINT) AS is_shift
FROM j
GROUP BY date, prev_date
ORDER BY date"""

  val usageHeatmapOracle: String = canonCte + """
, g AS (
  SELECT (event_time_us // 86400000000 + 4) % 7 AS dow,
         (event_time_us // 3600000000) % 24 AS hour,
         app_id, duration_ms
  FROM canon)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT app_id) AS BIGINT) AS n_apps,
       CAST(SUM(COALESCE(duration_ms, 0)) AS BIGINT) AS task_ms
FROM g GROUP BY dow, hour
ORDER BY dow, hour"""

  val capacityTrendsOracle: String = canonCte + """
, g AS (
  SELECT event_date AS date,
         CAST(SUM(peak_memory_bytes) AS BIGINT) AS peak_sum,
         CAST(COUNT(DISTINCT app_id) AS BIGINT) AS concurrent_apps,
         CAST(COUNT(*) AS BIGINT) AS total_tasks,
         AVG(cpu_time_ns) AS avg_cpu_ns
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
  GROUP BY event_date)
SELECT date,
       FLOOR((peak_sum / 1073741824.0) * 10000.0 + 0.5) / 10000.0 AS total_memory_gb_used,
       FLOOR(((avg_cpu_ns / 1000000000.0) * concurrent_apps) * 10000.0 + 0.5) / 10000.0 AS total_cpu_cores_used,
       concurrent_apps AS peak_concurrent_applications,
       total_tasks,
       FLOOR((peak_sum / 1073741824.0 / concurrent_apps) * 10000.0 + 0.5) / 10000.0 AS average_resource_utilization,
       FLOOR((LEAST(100.0, peak_sum / 1073741824.0 / 1024.0 * 100.0)) * 10000.0 + 0.5) / 10000.0 AS cluster_capacity_percentage
FROM g
ORDER BY date DESC
LIMIT 30"""
}
