package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte

/**
 * Block-manager / storage-registration summary per (app, executor).
 *
 * The reference stubs `/api/v1/applications/:app_id/storage/rdd` to an
 * empty list (src/api.rs:206-212) even though it parses the block
 * manager events; graft implements the summary from the events it
 * already extracts (SparkListenerBlockManagerAdded/Removed carry
 * executor/host/Maximum Memory — events/EventLogParser.scala maps them
 * into executor_id/host/max_memory), exceeding the reference the same
 * way jobs/stages do.
 *
 * Scale notes: one partial-aggregating groupBy over the (tiny)
 * registration slice; per-app filters push into the scan.
 */
object Storage {

  /** One row per (app, executor) storage registration: host, the
   *  registered max on-heap memory, first registration time, last
   *  deregistration time (null = still registered), event counts.
   *  ExecutorAdded rows are included alongside BlockManagerAdded — on
   *  a real log both appear and the max-memory payloads agree; the
   *  synthetic adapter corpus only emits the executor variant. */
  def appStorage(canon: DataFrame): DataFrame = {
    val isReg   = col("event_type").isin(BlockManagerAdded, ExecutorAdded)
    val isDereg = col("event_type").isin(BlockManagerRemoved, ExecutorRemoved)
    canon
      .filter((isReg && col("max_memory").isNotNull) || isDereg)
      .groupBy("app_id", "executor_id")
      .agg(
        max(when(isReg, col("host"))).as("host"),
        max(when(isReg, col("max_memory"))).as("max_onheap_memory"),
        min(when(isReg, col("event_time_us"))).as("registered_us"),
        max(when(isDereg, col("event_time_us"))).as("deregistered_us"),
        count(when(isReg, 1)).as("registration_events"),
        count(when(isDereg, 1)).as("deregistration_events"))
      .filter(col("registered_us").isNotNull)
      .orderBy("app_id", "executor_id")
  }

  val appStorageOracle: String = canonCte + """
, agg AS (
  SELECT app_id, executor_id,
         MAX(CASE WHEN event_type IN ('SparkListenerBlockManagerAdded', 'SparkListenerExecutorAdded') THEN host END) AS host,
         MAX(CASE WHEN event_type IN ('SparkListenerBlockManagerAdded', 'SparkListenerExecutorAdded') THEN max_memory END) AS max_onheap_memory,
         MIN(CASE WHEN event_type IN ('SparkListenerBlockManagerAdded', 'SparkListenerExecutorAdded') THEN event_time_us END) AS registered_us,
         MAX(CASE WHEN event_type IN ('SparkListenerBlockManagerRemoved', 'SparkListenerExecutorRemoved') THEN event_time_us END) AS deregistered_us,
         CAST(COUNT(CASE WHEN event_type IN ('SparkListenerBlockManagerAdded', 'SparkListenerExecutorAdded') THEN 1 END) AS BIGINT) AS registration_events,
         CAST(COUNT(CASE WHEN event_type IN ('SparkListenerBlockManagerRemoved', 'SparkListenerExecutorRemoved') THEN 1 END) AS BIGINT) AS deregistration_events
  FROM canon
  WHERE (event_type IN ('SparkListenerBlockManagerAdded', 'SparkListenerExecutorAdded') AND max_memory IS NOT NULL)
     OR event_type IN ('SparkListenerBlockManagerRemoved', 'SparkListenerExecutorRemoved')
  GROUP BY app_id, executor_id)
SELECT app_id, executor_id, host, max_onheap_memory, registered_us,
       deregistered_us, registration_events, deregistration_events
FROM agg
WHERE registered_us IS NOT NULL
ORDER BY app_id, executor_id"""
}
