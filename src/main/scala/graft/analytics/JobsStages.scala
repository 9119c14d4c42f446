package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte

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
}
