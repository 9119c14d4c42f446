package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.util.Round.r4
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte

/**
 * Platform-engineering "optimization" analytics: top resource consumers,
 * over/under-provisioning classification, cost opportunities.
 *
 * Reference behavior:
 *  - top resource consumers: src/storage/duckdb_store_backup.rs:1155-1240
 *  - efficiency analysis: src/storage/duckdb_store_backup.rs:1242-1361
 *  - cost-optimization opportunities: src/storage/duckdb_store_backup.rs:1429-1575
 *
 * All three are one per-app aggregation (150 groups per 150 apps — tiny
 * output) over the TaskEnd slice; classification CASEs run on the exact
 * integer sums so they are deterministic across engines and partitionings.
 */
object Optimization {

  private val taskEnd = col("event_type") === TaskEnd

  /** Per-app aggregates shared by the three optimization queries. */
  private def appRollup(canon: DataFrame): DataFrame =
    canon.filter(taskEnd)
      .groupBy("app_id")
      .agg(
        count(lit(1)).as("task_count"),
        avg("peak_memory_bytes").as("avg_peak_bytes"),
        max("peak_memory_bytes").as("max_peak_bytes"),
        sum("cpu_time_ns").as("sum_cpu_ns"),
        avg("cpu_time_ns").as("avg_cpu_ns"),
        avg("duration_ms").as("avg_duration_ms"),
        sum("disk_spilled_bytes").as("sum_disk_spill_bytes"),
        max("event_time_us").as("last_seen_us"))
      .withColumn("avg_memory_mb", col("avg_peak_bytes") / lit(1048576.0))
      .withColumn("peak_memory_mb", col("max_peak_bytes") / lit(1048576.0))
      .withColumn("total_disk_spill_mb", col("sum_disk_spill_bytes") / lit(1048576.0))

  /** Top memory consumers with efficiency score + recommendation.
   *  Reference: duckdb_store_backup.rs:1161-1202. */
  def resourceHogs(canon: DataFrame, limit: Int = 10): DataFrame =
    appRollup(canon)
      .filter(col("peak_memory_mb") > 0)
      .select(
        col("app_id"),
        concat(lit("app_"), col("app_id")).as("app_name"),
        lit("Memory").as("resource_type"),
        r4(col("peak_memory_mb")).as("consumption_value"),
        lit("MB").as("unit"),
        when(col("peak_memory_mb") > col("avg_memory_mb") * 1.5, 60.0)
          .when(col("peak_memory_mb") > col("avg_memory_mb") * 1.2, 75.0)
          .otherwise(85.0).as("efficiency_score"),
        r4(col("peak_memory_mb") * 0.001).as("cost_impact"),
        when(col("peak_memory_mb") > 8192.0, "Consider reducing executor memory")
          .when(col("peak_memory_mb") > 4096.0, "Monitor memory usage patterns")
          .otherwise("Memory usage appears optimal").as("recommendation"),
        col("last_seen_us"))
      .orderBy(col("consumption_value").desc, col("app_id"))
      .limit(limit)

  val resourceHogsOracle: String = canonCte + """
, r AS (
  SELECT app_id,
         AVG(peak_memory_bytes) / 1048576.0 AS avg_memory_mb,
         MAX(peak_memory_bytes) / 1048576.0 AS peak_memory_mb,
         MAX(event_time_us) AS last_seen_us
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
  GROUP BY app_id)
SELECT app_id,
       'app_' || app_id AS app_name,
       'Memory' AS resource_type,
       FLOOR((peak_memory_mb) * 10000.0 + 0.5) / 10000.0 AS consumption_value,
       'MB' AS unit,
       CASE WHEN peak_memory_mb > avg_memory_mb * 1.5 THEN 60.0
            WHEN peak_memory_mb > avg_memory_mb * 1.2 THEN 75.0
            ELSE 85.0 END AS efficiency_score,
       FLOOR((peak_memory_mb * 0.001) * 10000.0 + 0.5) / 10000.0 AS cost_impact,
       CASE WHEN peak_memory_mb > 8192.0 THEN 'Consider reducing executor memory'
            WHEN peak_memory_mb > 4096.0 THEN 'Monitor memory usage patterns'
            ELSE 'Memory usage appears optimal' END AS recommendation,
       last_seen_us
FROM r
WHERE peak_memory_mb > 0
ORDER BY consumption_value DESC, app_id
LIMIT 10"""

  /** Over/under-provisioned classification per app.
   *  Reference: duckdb_store_backup.rs:1248-1296. */
  def efficiencyAnalysis(canon: DataFrame, limit: Int = 20): DataFrame = {
    val cpuS  = col("avg_cpu_ns") / lit(1000000000.0)
    val wallS = col("avg_duration_ms") / lit(1000.0)
    // zero-duration guard: Spark double division by 0 yields NULL while
    // DuckDB (ieee ops) yields Infinity — NULL on both sides via
    // when()/NULLIF keeps the engines agreeing (category 'WellTuned',
    // efficiency 0.0) when a group's avg duration is 0
    val cpuPerWall = when(wallS > 0, cpuS / wallS)
    val ratio = cpuPerWall * lit(100.0)
    appRollup(canon)
      .filter(col("task_count") > 5)
      .select(
        col("app_id"),
        concat(lit("app_"), col("app_id")).as("app_name"),
        when(ratio < 30.0, "OverProvisioned")
          .when(ratio > 90.0, "UnderProvisioned")
          .otherwise("WellTuned").as("efficiency_category"),
        r4(coalesce(col("avg_memory_mb") /
          when(col("peak_memory_mb") =!= 0.0, col("peak_memory_mb")) * 100.0,
          lit(0.0))).as("memory_efficiency"),
        r4(coalesce(ratio, lit(0.0))).as("cpu_efficiency"),
        r4(col("peak_memory_mb") * 0.7).as("recommended_memory_gb"),
        // coalesce before greatest: NULL-vs-ignore semantics of
        // GREATEST differ across engines, so never feed it a NULL
        r4(greatest(lit(1.0), coalesce(cpuPerWall, lit(1.0))))
          .as("recommended_cpu_cores"),
        r4(when(ratio < 30.0, col("peak_memory_mb") * 0.0005).otherwise(0.0))
          .as("potential_cost_savings"),
        when(col("task_count") < 10, "High")
          .when(ratio < 20.0, "Low")
          .otherwise("Medium").as("risk_level"))
      .orderBy(col("potential_cost_savings").desc, col("app_id"))
      .limit(limit)
  }

  val efficiencyAnalysisOracle: String = canonCte + """
, r AS (
  SELECT app_id,
         CAST(COUNT(*) AS BIGINT) AS task_count,
         AVG(peak_memory_bytes) / 1048576.0 AS avg_memory_mb,
         MAX(peak_memory_bytes) / 1048576.0 AS peak_memory_mb,
         AVG(cpu_time_ns) / 1000000000.0 AS cpu_s,
         AVG(duration_ms) / 1000.0 AS wall_s
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
  GROUP BY app_id
  HAVING COUNT(*) > 5)
SELECT app_id,
       'app_' || app_id AS app_name,
       CASE WHEN cpu_s / NULLIF(wall_s, 0.0) * 100.0 < 30.0 THEN 'OverProvisioned'
            WHEN cpu_s / NULLIF(wall_s, 0.0) * 100.0 > 90.0 THEN 'UnderProvisioned'
            ELSE 'WellTuned' END AS efficiency_category,
       FLOOR((COALESCE(avg_memory_mb / NULLIF(peak_memory_mb, 0.0) * 100.0, 0.0)) * 10000.0 + 0.5) / 10000.0 AS memory_efficiency,
       FLOOR((COALESCE(cpu_s / NULLIF(wall_s, 0.0) * 100.0, 0.0)) * 10000.0 + 0.5) / 10000.0 AS cpu_efficiency,
       FLOOR((peak_memory_mb * 0.7) * 10000.0 + 0.5) / 10000.0 AS recommended_memory_gb,
       FLOOR((GREATEST(1.0, COALESCE(cpu_s / NULLIF(wall_s, 0.0), 1.0))) * 10000.0 + 0.5) / 10000.0 AS recommended_cpu_cores,
       FLOOR((CASE WHEN cpu_s / NULLIF(wall_s, 0.0) * 100.0 < 30.0 THEN peak_memory_mb * 0.0005 ELSE 0.0 END) * 10000.0 + 0.5) / 10000.0 AS potential_cost_savings,
       CASE WHEN task_count < 10 THEN 'High'
            WHEN cpu_s / NULLIF(wall_s, 0.0) * 100.0 < 20.0 THEN 'Low'
            ELSE 'Medium' END AS risk_level
FROM r
ORDER BY potential_cost_savings DESC, app_id
LIMIT 20"""

  /** Cost-optimization opportunities (over-provisioned memory / heavy
   *  spill / long tasks). Reference: duckdb_store_backup.rs:1435-1500. */
  def costOptimization(canon: DataFrame, limit: Int = 15): DataFrame = {
    val avgDurS = col("avg_duration_ms") / lit(1000.0)
    val overMem = col("avg_memory_mb") < col("peak_memory_mb") * 0.5
    val spilly  = col("total_disk_spill_mb") > 1000.0
    val longTsk = avgDurS > 300.0
    appRollup(canon)
      .filter(col("task_count") > 3)
      .filter(overMem || spilly || (avgDurS > 60.0))
      .select(
        col("app_id"),
        concat(lit("app_"), col("app_id")).as("app_name"),
        when(overMem, "ReduceMemory")
          .when(spilly, "OptimizePartitioning")
          .when(longTsk, "ReduceExecutors")
          .otherwise("EnableSpotInstances").as("optimization_type"),
        r4(col("peak_memory_mb") * 0.001).as("current_cost"),
        r4(when(overMem, col("peak_memory_mb") * 0.0005)
          .when(spilly, col("peak_memory_mb") * 0.0008)
          .otherwise(col("peak_memory_mb") * 0.0007)).as("optimized_cost"),
        when(overMem, 50.0).when(spilly, 20.0).otherwise(30.0).as("savings_percentage"),
        when(col("task_count") > 50, 85.0)
          .when(col("task_count") > 20, 70.0)
          .otherwise(50.0).as("confidence_score"),
        when(overMem, "Easy").when(spilly, "Medium").otherwise("Easy").as("difficulty"),
        when(overMem, concat(lit("Reduce executor memory from "),
            floor(col("peak_memory_mb")).cast("long").cast("string"),
            lit("MB to "),
            floor(col("avg_memory_mb") * 1.2).cast("long").cast("string"), lit("MB")))
          .when(spilly, concat(lit("Optimize data partitioning to reduce "),
            floor(col("total_disk_spill_mb")).cast("long").cast("string"),
            lit("MB of disk spill")))
          .otherwise(lit("Consider using spot instances for cost savings")).as("details"))
      .orderBy(col("savings_percentage").desc, col("app_id"))
      .limit(limit)
  }

  val costOptimizationOracle: String = canonCte + """
, r AS (
  SELECT app_id,
         CAST(COUNT(*) AS BIGINT) AS task_count,
         AVG(peak_memory_bytes) / 1048576.0 AS avg_memory_mb,
         MAX(peak_memory_bytes) / 1048576.0 AS peak_memory_mb,
         AVG(duration_ms) / 1000.0 AS avg_dur_s,
         CAST(COALESCE(SUM(disk_spilled_bytes), 0) AS BIGINT) / 1048576.0 AS total_disk_spill_mb
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
  GROUP BY app_id
  HAVING COUNT(*) > 3)
SELECT app_id,
       'app_' || app_id AS app_name,
       CASE WHEN avg_memory_mb < peak_memory_mb * 0.5 THEN 'ReduceMemory'
            WHEN total_disk_spill_mb > 1000.0 THEN 'OptimizePartitioning'
            WHEN avg_dur_s > 300.0 THEN 'ReduceExecutors'
            ELSE 'EnableSpotInstances' END AS optimization_type,
       FLOOR((peak_memory_mb * 0.001) * 10000.0 + 0.5) / 10000.0 AS current_cost,
       FLOOR((CASE WHEN avg_memory_mb < peak_memory_mb * 0.5 THEN peak_memory_mb * 0.0005
                  WHEN total_disk_spill_mb > 1000.0 THEN peak_memory_mb * 0.0008
                  ELSE peak_memory_mb * 0.0007 END) * 10000.0 + 0.5) / 10000.0 AS optimized_cost,
       CASE WHEN avg_memory_mb < peak_memory_mb * 0.5 THEN 50.0
            WHEN total_disk_spill_mb > 1000.0 THEN 20.0
            ELSE 30.0 END AS savings_percentage,
       CASE WHEN task_count > 50 THEN 85.0
            WHEN task_count > 20 THEN 70.0
            ELSE 50.0 END AS confidence_score,
       CASE WHEN avg_memory_mb < peak_memory_mb * 0.5 THEN 'Easy'
            WHEN total_disk_spill_mb > 1000.0 THEN 'Medium'
            ELSE 'Easy' END AS difficulty,
       CASE WHEN avg_memory_mb < peak_memory_mb * 0.5 THEN
              'Reduce executor memory from ' || CAST(CAST(FLOOR(peak_memory_mb) AS BIGINT) AS VARCHAR)
              || 'MB to ' || CAST(CAST(FLOOR(avg_memory_mb * 1.2) AS BIGINT) AS VARCHAR) || 'MB'
            WHEN total_disk_spill_mb > 1000.0 THEN
              'Optimize data partitioning to reduce ' || CAST(CAST(FLOOR(total_disk_spill_mb) AS BIGINT) AS VARCHAR)
              || 'MB of disk spill'
            ELSE 'Consider using spot instances for cost savings' END AS details
FROM r
WHERE (avg_memory_mb < peak_memory_mb * 0.5)
   OR (total_disk_spill_mb > 1000.0)
   OR (avg_dur_s > 60.0)
ORDER BY savings_percentage DESC, app_id
LIMIT 15"""
}
