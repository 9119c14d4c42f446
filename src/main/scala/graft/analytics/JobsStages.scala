package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte
import graft.operators.HistogramRank

/**
 * Per-application job and stage summaries — the
 * `/api/v1/applications/{id}/jobs` and `/stages` payloads that the
 * reference leaves as TODO stubs returning `[]`
 * (reference: src/api.rs:153-159, :197-203). Graft implements them
 * from the canonical frame: both are a single conditional-aggregate
 * `groupBy` (no join — stage lifecycle events and task metrics land in
 * the same group), so they scale exactly like the other analytics.
 */
object JobsStages {

  /** Job lifecycle per (app, job): submit/complete times, duration,
   *  status. */
  def appJobs(canon: DataFrame): DataFrame =
    canon.filter(col("job_id").isNotNull)
      .groupBy("app_id", "job_id")
      .agg(
        min(when(col("event_type") === JobStart, col("event_time_us"))).as("submitted_us"),
        max(when(col("event_type") === JobEnd, col("event_time_us"))).as("completed_us"))
      .select(
        col("app_id"), col("job_id"), col("submitted_us"), col("completed_us"),
        when(col("submitted_us").isNotNull && col("completed_us").isNotNull,
          ((col("completed_us") - col("submitted_us")) / 1000.0).cast("long"))
          .as("duration_ms"),
        when(col("completed_us").isNull, "RUNNING").otherwise("SUCCEEDED").as("status"))
      .orderBy("app_id", "job_id")

  val appJobsOracle: String = canonCte + """
, j AS (
  SELECT app_id, job_id,
         MIN(CASE WHEN event_type = 'SparkListenerJobStart' THEN event_time_us END) AS submitted_us,
         MAX(CASE WHEN event_type = 'SparkListenerJobEnd' THEN event_time_us END) AS completed_us
  FROM canon WHERE job_id IS NOT NULL
  GROUP BY app_id, job_id)
SELECT app_id, job_id, submitted_us, completed_us,
       CASE WHEN submitted_us IS NOT NULL AND completed_us IS NOT NULL
            THEN CAST(TRUNC((completed_us - submitted_us) / 1000.0) AS BIGINT) END AS duration_ms,
       CASE WHEN completed_us IS NULL THEN 'RUNNING' ELSE 'SUCCEEDED' END AS status
FROM j
ORDER BY app_id, job_id"""

  /** Stage summary per (app, stage): lifecycle times + task metric
   *  rollup, mirroring the history-server StageData essentials. */
  def appStages(canon: DataFrame): DataFrame =
    canon.filter(col("stage_id").isNotNull)
      .groupBy("app_id", "stage_id")
      .agg(
        min(when(col("event_type") === StageSubmitted, col("event_time_us"))).as("submitted_us"),
        max(when(col("event_type") === StageCompleted, col("event_time_us"))).as("completed_us"),
        count(when(col("event_type") === TaskEnd, 1)).as("num_tasks"),
        coalesce(sum(when(col("event_type") === TaskEnd, col("duration_ms"))), lit(0L))
          .as("total_task_duration_ms"),
        coalesce(sum("input_bytes"), lit(0L)).as("input_bytes"),
        coalesce(sum("output_bytes"), lit(0L)).as("output_bytes"),
        coalesce(sum("shuffle_read_bytes"), lit(0L)).as("shuffle_read_bytes"),
        coalesce(sum("shuffle_write_bytes"), lit(0L)).as("shuffle_write_bytes"),
        count(when(col("event_type") === TaskEnd && col("end_reason") =!= "Success", 1))
          .as("failed_tasks"))
      .withColumn("status",
        when(col("completed_us").isNotNull, "COMPLETE").otherwise("ACTIVE"))
      .orderBy("app_id", "stage_id")

  val appStagesOracle: String = canonCte + """
SELECT app_id, stage_id,
       MIN(CASE WHEN event_type = 'SparkListenerStageSubmitted' THEN event_time_us END) AS submitted_us,
       MAX(CASE WHEN event_type = 'SparkListenerStageCompleted' THEN event_time_us END) AS completed_us,
       CAST(COUNT(CASE WHEN event_type = 'SparkListenerTaskEnd' THEN 1 END) AS BIGINT) AS num_tasks,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'SparkListenerTaskEnd' THEN duration_ms END), 0) AS BIGINT) AS total_task_duration_ms,
       CAST(COALESCE(SUM(input_bytes), 0) AS BIGINT) AS input_bytes,
       CAST(COALESCE(SUM(output_bytes), 0) AS BIGINT) AS output_bytes,
       CAST(COALESCE(SUM(shuffle_read_bytes), 0) AS BIGINT) AS shuffle_read_bytes,
       CAST(COALESCE(SUM(shuffle_write_bytes), 0) AS BIGINT) AS shuffle_write_bytes,
       CAST(COUNT(CASE WHEN event_type = 'SparkListenerTaskEnd' AND end_reason <> 'Success' THEN 1 END) AS BIGINT) AS failed_tasks,
       CASE WHEN MAX(CASE WHEN event_type = 'SparkListenerStageCompleted' THEN event_time_us END) IS NOT NULL
            THEN 'COMPLETE' ELSE 'ACTIVE' END AS status
FROM canon
WHERE stage_id IS NOT NULL
GROUP BY app_id, stage_id
ORDER BY app_id, stage_id"""

  /** Per-app task-metric distributions — the history-server
   *  `taskMetricsDistributions` payload shape (the real Spark UI's
   *  stage-page quantile strip), computed DETERMINISTICALLY: the
   *  quantile is the element at sorted index `floor(p*(n-1)) + 1`
   *  (nearest-rank on the lower side), an exact integer pick — not
   *  `percentile_approx`, whose sketch output is neither exact nor
   *  engine-portable.
   *
   *  Exact AND scale-safe without ranking tasks: `duration_ms` and
   *  `gc_time_ms` are bounded integers, so the corpus partial-aggs to
   *  a per-(app, metric, value) HISTOGRAM (the stack unpivot fans out
   *  in-row, then combines map-side), the nearest-rank rule runs as a
   *  cumulative window over that bounded histogram only — the value
   *  at rank r is the histogram row with `cum_below < r <= cum_le` —
   *  and one conditional-aggregate pass emits the strip. No operator
   *  ever sorts task-cardinality rows: a 100 TB app's tens of millions
   *  of TaskEnds collapse to at most |distinct ms values| rows before
   *  any sort (the shape `surprisalBuckets` pioneered, SURVEY §4). */
  def taskQuantiles(canon: DataFrame): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd &&
        col("duration_ms").isNotNull && col("gc_time_ms").isNotNull)
      .select(col("app_id"),
        expr("stack(2, 'd', duration_ms, 'g', gc_time_ms)").as(Seq("m", "v")))
    val hist = tasks.groupBy("app_id", "m", "v").agg(count(lit(1)).as("cnt"))
    val cum = HistogramRank.cumulate(hist, Seq("app_id", "m"), "v")
    def at(metric: String, p: Double) =
      HistogramRank.at("v", p, gate = col("m") === metric)
    cum.groupBy("app_id").agg(
      max("n").as("task_n"),
      at("d", 0.5).as("p50_duration_ms"),
      at("d", 0.75).as("p75_duration_ms"),
      at("d", 0.95).as("p95_duration_ms"),
      max(when(col("m") === "d", col("v"))).as("max_duration_ms"),
      at("g", 0.5).as("p50_gc_ms"),
      at("g", 0.95).as("p95_gc_ms"),
      max(when(col("m") === "g", col("v"))).as("max_gc_ms"))
      .orderBy("app_id")
  }

  /** PER-STAGE task-metric distributions — the real history-server
   *  `taskMetricsDistributions` payload is keyed by stage, not app
   *  (the stage page's quantile strip). Same histogram-rank discipline
   *  as [[taskQuantiles]] at the (app_id, stage_id) grain: partial-agg
   *  to a per-(stage, metric, value) histogram, cumulative window over
   *  the histogram only, conditional-aggregate picks. Stages with a
   *  single task still get exact quantiles (rank 1 lands on the only
   *  histogram row). */
  def stageQuantiles(canon: DataFrame): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("stage_id").isNotNull &&
        col("duration_ms").isNotNull && col("gc_time_ms").isNotNull)
      .select(col("app_id"), col("stage_id"),
        expr("stack(2, 'd', duration_ms, 'g', gc_time_ms)").as(Seq("m", "v")))
    val hist = tasks.groupBy("app_id", "stage_id", "m", "v")
      .agg(count(lit(1)).as("cnt"))
    val cum = HistogramRank.cumulate(hist, Seq("app_id", "stage_id", "m"), "v")
    def at(metric: String, p: Double) =
      HistogramRank.at("v", p, gate = col("m") === metric)
    cum.groupBy("app_id", "stage_id").agg(
      max("n").as("task_n"),
      at("d", 0.5).as("p50_duration_ms"),
      at("d", 0.75).as("p75_duration_ms"),
      at("d", 0.95).as("p95_duration_ms"),
      max(when(col("m") === "d", col("v"))).as("max_duration_ms"),
      at("g", 0.5).as("p50_gc_ms"),
      at("g", 0.95).as("p95_gc_ms"),
      max(when(col("m") === "g", col("v"))).as("max_gc_ms"))
      .orderBy("app_id", "stage_id")
  }

  val stageQuantilesOracle: String = canonCte + """
, t AS (
  SELECT app_id, stage_id, duration_ms, gc_time_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd' AND stage_id IS NOT NULL
    AND duration_ms IS NOT NULL AND gc_time_ms IS NOT NULL),
lng AS (
  SELECT app_id, stage_id, 'd' AS m, duration_ms AS v FROM t
  UNION ALL
  SELECT app_id, stage_id, 'g' AS m, gc_time_ms AS v FROM t),
hist AS (
  SELECT app_id, stage_id, m, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lng GROUP BY app_id, stage_id, m, v),
""" + HistogramRank.cumCteSql("hist", Seq("app_id", "stage_id", "m"), "v") + s"""
SELECT app_id, stage_id, CAST(MAX(n) AS BIGINT) AS task_n,
       ${HistogramRank.pickSql("v", 0.5, "p50_duration_ms", "m = 'd'")},
       ${HistogramRank.pickSql("v", 0.75, "p75_duration_ms", "m = 'd'")},
       ${HistogramRank.pickSql("v", 0.95, "p95_duration_ms", "m = 'd'")},
       MAX(CASE WHEN m = 'd' THEN v END) AS max_duration_ms,
       ${HistogramRank.pickSql("v", 0.5, "p50_gc_ms", "m = 'g'")},
       ${HistogramRank.pickSql("v", 0.95, "p95_gc_ms", "m = 'g'")},
       MAX(CASE WHEN m = 'g' THEN v END) AS max_gc_ms
FROM cum
GROUP BY app_id, stage_id
ORDER BY app_id, stage_id"""

  val taskQuantilesOracle: String = canonCte + """
, t AS (
  SELECT app_id, duration_ms, gc_time_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
    AND duration_ms IS NOT NULL AND gc_time_ms IS NOT NULL),
lng AS (
  SELECT app_id, 'd' AS m, duration_ms AS v FROM t
  UNION ALL
  SELECT app_id, 'g' AS m, gc_time_ms AS v FROM t),
hist AS (
  SELECT app_id, m, v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lng GROUP BY app_id, m, v),
""" + HistogramRank.cumCteSql("hist", Seq("app_id", "m"), "v") + s"""
SELECT app_id, CAST(MAX(n) AS BIGINT) AS task_n,
       ${HistogramRank.pickSql("v", 0.5, "p50_duration_ms", "m = 'd'")},
       ${HistogramRank.pickSql("v", 0.75, "p75_duration_ms", "m = 'd'")},
       ${HistogramRank.pickSql("v", 0.95, "p95_duration_ms", "m = 'd'")},
       MAX(CASE WHEN m = 'd' THEN v END) AS max_duration_ms,
       ${HistogramRank.pickSql("v", 0.5, "p50_gc_ms", "m = 'g'")},
       ${HistogramRank.pickSql("v", 0.95, "p95_gc_ms", "m = 'g'")},
       MAX(CASE WHEN m = 'g' THEN v END) AS max_gc_ms
FROM cum
GROUP BY app_id
ORDER BY app_id"""
}
