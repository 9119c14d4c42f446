package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.events.EventModel._
import graft.events.TestDataAdapter.canonCte
import graft.util.Round.r4

/**
 * Cluster-health diagnostics beyond the reference's analytics surface:
 * straggler detection, executor-allocation timeline, and user
 * sessionization. All three are single window-pass shapes — one
 * exchange keyed on the partition column, sorts and running
 * aggregates inside the partition, partial aggregation after — the
 * plan family that survives a 100x scale-up unchanged.
 */
object Diagnostics {

  /** Straggler/skew detection per (app, stage): the max-vs-median task
   *  duration ratio, the first thing an on-call engineer asks of a slow
   *  stage. Median is the deterministic nearest-rank pick (index
   *  `floor(0.5*(n-1)) + 1` in sorted order), not percentile_approx.
   *  Stages with fewer than minTasks tasks are noise and excluded. */
  def stragglerStages(canon: DataFrame, minTasks: Long = 5L,
                      skewThreshold: Double = 2.0): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("duration_ms").isNotNull)
      .select("app_id", "stage_id", "duration_ms")
      .filter(col("stage_id").isNotNull)
    val byStage = Window.partitionBy("app_id", "stage_id")
    val idx = tasks
      .withColumn("rk", row_number().over(byStage.orderBy("duration_ms")))
      .withColumn("n", count(lit(1)).over(byStage))
    idx.groupBy("app_id", "stage_id").agg(
      max("n").as("task_n"),
      min(when(col("rk") === floor(lit(0.5) * (col("n") - 1)) + 1,
        col("duration_ms"))).as("p50_duration_ms"),
      max("duration_ms").as("max_duration_ms"))
      .filter(col("task_n") >= minTasks)
      .select(
        col("app_id"), col("stage_id"), col("task_n"),
        col("p50_duration_ms"), col("max_duration_ms"),
        r4(when(col("p50_duration_ms") > 0,
          col("max_duration_ms") * lit(1.0) / col("p50_duration_ms")))
          .as("skew_ratio"),
        when(col("p50_duration_ms") > 0 &&
          col("max_duration_ms") * lit(1.0) / col("p50_duration_ms")
            >= skewThreshold, 1L).otherwise(0L).as("is_skewed"))
      .orderBy("app_id", "stage_id")
  }

  val stragglerStagesOracle: String = canonCte + """
, t AS (
  SELECT app_id, stage_id, duration_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
    AND duration_ms IS NOT NULL AND stage_id IS NOT NULL),
idx AS (
  SELECT app_id, stage_id, duration_ms,
         ROW_NUMBER() OVER (PARTITION BY app_id, stage_id ORDER BY duration_ms) AS rk,
         COUNT(*) OVER (PARTITION BY app_id, stage_id) AS n
  FROM t),
agg AS (
  SELECT app_id, stage_id,
         CAST(MAX(n) AS BIGINT) AS task_n,
         MIN(CASE WHEN rk = FLOOR(0.5 * (n - 1)) + 1 THEN duration_ms END) AS p50_duration_ms,
         MAX(duration_ms) AS max_duration_ms
  FROM idx
  GROUP BY app_id, stage_id)
SELECT app_id, stage_id, task_n, p50_duration_ms, max_duration_ms,
       FLOOR((CASE WHEN p50_duration_ms > 0
              THEN max_duration_ms * 1.0 / p50_duration_ms END) * 10000.0 + 0.5) / 10000.0 AS skew_ratio,
       CAST(CASE WHEN p50_duration_ms > 0
                  AND max_duration_ms * 1.0 / p50_duration_ms >= 2.0
             THEN 1 ELSE 0 END AS BIGINT) AS is_skewed
FROM agg
WHERE task_n >= 5
ORDER BY app_id, stage_id"""

  /** Executor-allocation timeline per app: every add/remove event with
   *  the running count of live executors — the Spark UI's allocation
   *  strip as a frame. One cumulative-sum window per app over a total
   *  deterministic order. Removal rows carry the parser-extracted
   *  `Removed Reason` (preemption/OOM-kill/timeout attribution — the
   *  first question about a sawtooth allocation graph); add rows have
   *  it null. */
  def executorTimeline(canon: DataFrame): DataFrame = {
    // tolerate reason-less frames (hand-built or pre-round-5 stores)
    val reason =
      if (canon.columns.contains("removed_reason")) col("removed_reason")
      else lit(null).cast("string").as("removed_reason")
    val ev = canon
      .filter(col("event_type").isin(ExecutorAdded, ExecutorRemoved))
      .select(col("app_id"), col("event_time_us"), col("executor_id"),
        when(col("event_type") === ExecutorAdded, 1L).otherwise(-1L).as("delta"),
        reason)
    ev.withColumn("active_executors",
        sum("delta").over(Window.partitionBy("app_id")
          .orderBy("event_time_us", "executor_id", "delta")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("app_id", "event_time_us", "executor_id", "delta")
  }

  val executorTimelineOracle: String = canonCte + """
, ev AS (
  SELECT app_id, event_time_us, executor_id,
         CAST(CASE WHEN event_type = 'SparkListenerExecutorAdded'
               THEN 1 ELSE -1 END AS BIGINT) AS delta,
         removed_reason
  FROM canon
  WHERE event_type IN ('SparkListenerExecutorAdded', 'SparkListenerExecutorRemoved'))
SELECT app_id, event_time_us, executor_id, delta, removed_reason,
       CAST(SUM(delta) OVER (PARTITION BY app_id
         ORDER BY event_time_us, executor_id, delta
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active_executors
FROM ev
ORDER BY app_id, event_time_us, executor_id, delta"""

  /** Executor CHURN per app — the allocation-stability rollup over
   *  [[executorTimeline]]'s strip: adds, removes, the peak concurrent
   *  count, and removed/added. A churn ratio near 1 with a sawtooth
   *  peak means dynamic allocation is thrashing (executors paid for
   *  but re-warmed constantly — the classic idle-timeout-too-low
   *  signature); removes ≪ adds with a flat peak is a healthy
   *  ramp-and-hold profile. Shape: the timeline's one bounded window
   *  (executor events, orders of magnitude below task events) + one
   *  app-keyed partial agg. */
  def executorChurn(canon: DataFrame): DataFrame =
    executorTimeline(canon)
      .groupBy("app_id").agg(
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_removed"),
        max("active_executors").as("peak_active"))
      .select(col("app_id"), col("n_added"), col("n_removed"),
        col("peak_active"),
        graft.util.Round.r4(col("n_removed") * lit(1.0)
          / greatest(col("n_added"), lit(1L))).as("churn_ratio"))
      .orderBy("app_id")

  /** [[executorTimelineOracle]]'s windowed strip + the app rollup. */
  val executorChurnOracle: String = canonCte + """
, ev AS (
  SELECT app_id, event_time_us, executor_id,
         CAST(CASE WHEN event_type = 'SparkListenerExecutorAdded'
               THEN 1 ELSE -1 END AS BIGINT) AS delta
  FROM canon
  WHERE event_type IN ('SparkListenerExecutorAdded', 'SparkListenerExecutorRemoved')),
tl AS (
  SELECT app_id, delta,
         SUM(delta) OVER (PARTITION BY app_id
           ORDER BY event_time_us, executor_id, delta
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active_executors
  FROM ev)
SELECT app_id,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(MAX(active_executors) AS BIGINT) AS peak_active,
       FLOOR((SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) * 1.0
              / GREATEST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END), 1))
             * 10000.0 + 0.5) / 10000.0 AS churn_ratio
FROM tl
GROUP BY app_id
ORDER BY app_id"""

  /** Every TaskEnd joined to its executor's registration (cores,
   *  max memory) AS OF task time — the canonical time-series
   *  enrichment, via [[graft.operators.AsofJoin]]'s union-window
   *  form (one shuffle, NO join operator in the plan). The DuckDB
   *  oracle uses the engine's native ASOF JOIN, so the operator is
   *  verified against an independent as-of implementation. */
  def taskExecutorAsof(canon: DataFrame): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("executor_id").isNotNull &&
        col("event_time_us").isNotNull)
      .select("app_id", "executor_id", "event_time_us", "event_id",
        "task_id", "duration_ms")
    val execs = canon
      .filter(col("event_type") === ExecutorAdded && col("executor_id").isNotNull &&
        col("event_time_us").isNotNull)
      .select("app_id", "executor_id", "event_time_us", "event_id",
        "cores", "max_memory")
    graft.operators.AsofJoin.asofJoin(
      tasks, execs, keys = Seq("app_id", "executor_id"),
      timeCol = "event_time_us", payload = Seq("cores", "max_memory"),
      tieBreak = "event_id")
      .select(col("app_id"), col("executor_id"), col("event_id"),
        col("event_time_us"), col("task_id"), col("duration_ms"),
        col("cores").cast("long").as("exec_cores"),
        col("max_memory").as("exec_max_memory"))
      .orderBy("event_id")
  }

  val taskExecutorAsofOracle: String = canonCte + """
, t AS (
  SELECT app_id, executor_id, event_time_us, event_id, task_id, duration_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
    AND executor_id IS NOT NULL AND event_time_us IS NOT NULL),
e AS (
  SELECT app_id, executor_id, event_time_us, cores, max_memory,
         ROW_NUMBER() OVER (PARTITION BY app_id, executor_id, event_time_us
           ORDER BY event_id DESC) AS rn
  FROM canon
  WHERE event_type = 'SparkListenerExecutorAdded'
    AND executor_id IS NOT NULL AND event_time_us IS NOT NULL),
ed AS (SELECT app_id, executor_id, event_time_us, cores, max_memory FROM e WHERE rn = 1)
SELECT t.app_id, t.executor_id, t.event_id, t.event_time_us, t.task_id,
       t.duration_ms,
       CAST(ed.cores AS BIGINT) AS exec_cores,
       ed.max_memory AS exec_max_memory
FROM t ASOF LEFT JOIN ed
  ON t.app_id = ed.app_id AND t.executor_id = ed.executor_id
 AND ed.event_time_us <= t.event_time_us
ORDER BY t.event_id"""

  /** Work attribution per executor LIFETIME — every TaskEnd joined
   *  onto its executor's [registration, removal] interval;
   *  removal-less executors close at their app's last event.
   *  Complements [[taskExecutorAsof]]: as-of stamps each task with the
   *  latest registration BEFORE it, the interval join additionally
   *  bounds the END — a task logged after its executor's removal (late
   *  heartbeat, clock skew, lost-then-reported) attributes to NO
   *  lifetime and drops out, which is the semantic a billing or
   *  bad-node rollup needs. Output: per (app, executor) lifetime, its
   *  task count and task-ms. The per-app close-off bound is a
   *  broadcast one-row-per-app join.
   *
   *  NOT a [[graft.operators.RangeJoin]] call, deliberately: banded
   *  blocking earns its explode fan-out only when one key holds MANY
   *  intervals. Here the build side is unique per (app_id,
   *  executor_id) — min/max collapsed one interval per key — so the
   *  equi-join on the key alone is already linear (every probe row
   *  meets exactly one interval) and the interval side is tiny
   *  relative to tasks — AQE broadcasts it when it fits, shuffles on
   *  the (already co-located) key when it doesn't; banding the same
   *  join just multiplies the build side by span/width (executor
   *  lifetimes span their whole app, thousands of 60s buckets each)
   *  for zero pruning. */
  def executorTaskRange(canon: DataFrame): DataFrame = {
    val execEv = canon
      .filter(col("event_type").isin(ExecutorAdded, ExecutorRemoved) &&
        col("executor_id").isNotNull && col("event_time_us").isNotNull)
    val iv0 = execEv.groupBy("app_id", "executor_id").agg(
      min(when(col("event_type") === ExecutorAdded, col("event_time_us")))
        .as("life_start_us"),
      max(when(col("event_type") === ExecutorRemoved, col("event_time_us")))
        .as("life_end_raw"))
    val appMax = canon.filter(col("event_time_us").isNotNull)
      .groupBy("app_id").agg(max("event_time_us").as("app_max_us"))
    val iv = iv0.join(broadcast(appMax), "app_id")
      .filter(col("life_start_us").isNotNull)
      .select(col("app_id"), col("executor_id"), col("life_start_us"),
        coalesce(col("life_end_raw"), col("app_max_us")).as("life_end_us"))
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("executor_id").isNotNull &&
        col("event_time_us").isNotNull)
      .select("app_id", "executor_id", "event_time_us", "duration_ms")
    tasks.join(iv, Seq("app_id", "executor_id"))
      .filter(col("event_time_us") >= col("life_start_us") &&
        col("event_time_us") <= col("life_end_us"))
      .groupBy("app_id", "executor_id", "life_start_us", "life_end_us")
      .agg(count(lit(1)).as("n_tasks"), sum("duration_ms").as("task_ms"))
      .orderBy("app_id", "executor_id", "life_start_us")
  }

  /** The BETWEEN join is planned natively by DuckDB — the operator is
   *  verified against an independent interval-join implementation
   *  (same discipline as [[taskExecutorAsofOracle]]'s native ASOF). */
  val executorTaskRangeOracle: String = canonCte + """
, ee AS (
  SELECT app_id, executor_id, event_type, event_time_us
  FROM canon
  WHERE event_type IN ('SparkListenerExecutorAdded', 'SparkListenerExecutorRemoved')
    AND executor_id IS NOT NULL AND event_time_us IS NOT NULL),
iv0 AS (
  SELECT app_id, executor_id,
         MIN(CASE WHEN event_type = 'SparkListenerExecutorAdded'
                  THEN event_time_us END) AS life_start_us,
         MAX(CASE WHEN event_type = 'SparkListenerExecutorRemoved'
                  THEN event_time_us END) AS life_end_raw
  FROM ee GROUP BY app_id, executor_id),
amax AS (
  SELECT app_id, MAX(event_time_us) AS app_max_us
  FROM canon WHERE event_time_us IS NOT NULL GROUP BY app_id),
iv AS (
  SELECT i.app_id, i.executor_id, i.life_start_us,
         COALESCE(i.life_end_raw, a.app_max_us) AS life_end_us
  FROM iv0 i JOIN amax a ON i.app_id = a.app_id
  WHERE i.life_start_us IS NOT NULL),
t AS (
  SELECT app_id, executor_id, event_time_us, duration_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
    AND executor_id IS NOT NULL AND event_time_us IS NOT NULL)
SELECT iv.app_id, iv.executor_id, iv.life_start_us, iv.life_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_tasks,
       CAST(SUM(t.duration_ms) AS BIGINT) AS task_ms
FROM t JOIN iv
  ON t.app_id = iv.app_id AND t.executor_id = iv.executor_id
 AND t.event_time_us BETWEEN iv.life_start_us AND iv.life_end_us
GROUP BY iv.app_id, iv.executor_id, iv.life_start_us, iv.life_end_us
ORDER BY iv.app_id, iv.executor_id, iv.life_start_us"""

  /** Per-app critical-path decomposition: the wall-clock lower bound a
   *  perfectly-parallel scheduler could reach (each stage is gated by
   *  its slowest task, stages assumed sequential — the Spark DAG's
   *  dominant chain) vs the total task time actually burned. The ratio
   *  is the app's ideal parallel speedup; the gap between the two is
   *  what an auto-scaler can actually recover. Two partial
   *  aggregations, both map-side combining, integer ms throughout —
   *  the per-stage max/sum collapses each (app, stage) before the
   *  per-app rollup, so the second exchange carries one row per stage
   *  regardless of task count. */
  def criticalPath(canon: DataFrame): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("duration_ms").isNotNull &&
        col("stage_id").isNotNull)
      .select("app_id", "stage_id", "duration_ms")
    val perStage = tasks.groupBy("app_id", "stage_id").agg(
      count(lit(1)).as("task_n"),
      sum("duration_ms").as("stage_task_ms"),
      max("duration_ms").as("stage_critical_ms"))
    perStage.groupBy("app_id").agg(
      count(lit(1)).as("n_stages"),
      sum("task_n").as("n_tasks"),
      sum("stage_task_ms").as("total_task_ms"),
      sum("stage_critical_ms").as("critical_path_ms"))
      .select(
        col("app_id"), col("n_stages"), col("n_tasks"),
        col("total_task_ms"), col("critical_path_ms"),
        r4(when(col("critical_path_ms") > 0,
          col("total_task_ms") * lit(1.0) / col("critical_path_ms")))
          .as("ideal_speedup"))
      .orderBy("app_id")
  }

  val criticalPathOracle: String = canonCte + """
, t AS (
  SELECT app_id, stage_id, duration_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
    AND duration_ms IS NOT NULL AND stage_id IS NOT NULL),
per_stage AS (
  SELECT app_id, stage_id,
         CAST(COUNT(*) AS BIGINT) AS task_n,
         CAST(SUM(duration_ms) AS BIGINT) AS stage_task_ms,
         MAX(duration_ms) AS stage_critical_ms
  FROM t GROUP BY app_id, stage_id)
SELECT app_id,
       CAST(COUNT(*) AS BIGINT) AS n_stages,
       CAST(SUM(task_n) AS BIGINT) AS n_tasks,
       CAST(SUM(stage_task_ms) AS BIGINT) AS total_task_ms,
       CAST(SUM(stage_critical_ms) AS BIGINT) AS critical_path_ms,
       FLOOR((CASE WHEN SUM(stage_critical_ms) > 0
              THEN SUM(stage_task_ms) * 1.0 / SUM(stage_critical_ms) END) * 10000.0 + 0.5) / 10000.0 AS ideal_speedup
FROM per_stage
GROUP BY app_id
ORDER BY app_id"""

  /** Driver idle-gap analysis (gaps-and-islands over job intervals):
   *  merge each app's job intervals into busy islands — a new island
   *  starts when a job begins after every earlier job has ended — and
   *  report wall time, busy time, the idle remainder, and the gap
   *  count. High `idle_frac` with many islands is the "driver does
   *  sequential work between jobs" signature (collect-and-loop driver
   *  code, slow planning, external calls) that executor-side metrics
   *  can't see. Jobs pair by (app, job_id): min JobStart ts to max
   *  JobEnd ts; unpaired jobs drop. Shape: one shuffle by app for the
   *  per-app ordered windows (running max-end, island ids), then one
   *  two-level aggregate (island → app); everything after the first
   *  window runs on interval cardinality. */
  def appIdleGaps(canon: DataFrame): DataFrame = {
    val jobs = canon
      .filter(col("event_type").isin("SparkListenerJobStart",
        "SparkListenerJobEnd") && col("job_id").isNotNull)
      .groupBy("app_id", "job_id").agg(
        min(when(col("event_type") === "SparkListenerJobStart",
          col("event_time_us"))).as("start_us"),
        max(when(col("event_type") === "SparkListenerJobEnd",
          col("event_time_us"))).as("end_us"))
      .filter(col("start_us").isNotNull && col("end_us").isNotNull &&
        col("end_us") >= col("start_us"))
    val ordered = Window.partitionBy("app_id")
      .orderBy(col("start_us"), col("end_us"), col("job_id"))
    val prevMaxEnd = max("end_us").over(
      ordered.rowsBetween(Window.unboundedPreceding, -1))
    val islands = jobs
      .withColumn("new_island",
        when(prevMaxEnd.isNull || col("start_us") > prevMaxEnd, 1L)
          .otherwise(0L))
      .withColumn("island", sum("new_island").over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perIsland = islands.groupBy("app_id", "island").agg(
      count(lit(1)).as("n_jobs"),
      min("start_us").as("i_start"), max("end_us").as("i_end"))
    perIsland.groupBy("app_id").agg(
        sum("n_jobs").as("n_jobs"),
        count(lit(1)).as("n_islands"),
        (max("i_end") - min("i_start")).as("wall_us"),
        sum(col("i_end") - col("i_start")).as("busy_us"))
      .select(col("app_id"), col("n_jobs"), col("n_islands"),
        col("wall_us"), col("busy_us"),
        (col("wall_us") - col("busy_us")).as("idle_us"),
        r4(when(col("wall_us") > 0,
          (col("wall_us") - col("busy_us")) * lit(1.0) / col("wall_us"))
          .otherwise(lit(0.0))).as("idle_frac"))
      .orderBy("app_id")
  }

  val appIdleGapsOracle: String = canonCte + """
, jobs AS (
  SELECT app_id, job_id,
         MIN(CASE WHEN event_type = 'SparkListenerJobStart' THEN event_time_us END) AS start_us,
         MAX(CASE WHEN event_type = 'SparkListenerJobEnd' THEN event_time_us END) AS end_us
  FROM canon
  WHERE event_type IN ('SparkListenerJobStart', 'SparkListenerJobEnd')
    AND job_id IS NOT NULL
  GROUP BY app_id, job_id),
paired AS (
  SELECT app_id, job_id, start_us, end_us FROM jobs
  WHERE start_us IS NOT NULL AND end_us IS NOT NULL AND end_us >= start_us),
flagged AS (
  SELECT app_id, job_id, start_us, end_us,
         CASE WHEN MAX(end_us) OVER (PARTITION BY app_id
                ORDER BY start_us, end_us, job_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR start_us > MAX(end_us) OVER (PARTITION BY app_id
                ORDER BY start_us, end_us, job_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM paired),
islanded AS (
  SELECT app_id, start_us, end_us,
         SUM(new_island) OVER (PARTITION BY app_id
           ORDER BY start_us, end_us, job_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged),
per_island AS (
  SELECT app_id, island,
         CAST(COUNT(*) AS BIGINT) AS n_jobs,
         MIN(start_us) AS i_start, MAX(end_us) AS i_end
  FROM islanded GROUP BY app_id, island),
per_app AS (
  SELECT app_id,
         CAST(SUM(n_jobs) AS BIGINT) AS n_jobs,
         CAST(COUNT(*) AS BIGINT) AS n_islands,
         CAST(MAX(i_end) - MIN(i_start) AS BIGINT) AS wall_us,
         CAST(SUM(i_end - i_start) AS BIGINT) AS busy_us
  FROM per_island GROUP BY app_id)
SELECT app_id, n_jobs, n_islands, wall_us, busy_us,
       wall_us - busy_us AS idle_us,
       CASE WHEN wall_us > 0 THEN
         FLOOR(((wall_us - busy_us) * 1.0 / wall_us) * 10000.0 + 0.5) / 10000.0
       ELSE 0.0 END AS idle_frac
FROM per_app
ORDER BY app_id"""

  /** Per-host workload and failure concentration — the bad-node
   *  detector: a host whose failure share runs ahead of its task
   *  share (`failure_concentration` > 1) is failing MORE than its
   *  workload explains (disk going bad, memory errors, noisy
   *  neighbor), the signal a cluster operator decommissions on.
   *  One map-side-combining aggregate to host cardinality; the share
   *  windows run over that per-host aggregate only. The concentration
   *  ratio is computed in doubles (integer products would overflow at
   *  fleet scale), one fixed expression mirrored by the oracle. */
  def hostHotspots(canon: DataFrame): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("host").isNotNull &&
        col("duration_ms").isNotNull)
      .select(col("host"), col("duration_ms"), col("input_bytes"),
        when(col("end_reason").isNotNull && col("end_reason") =!= "Success",
          1L).otherwise(0L).as("failed"))
    val all = Window.partitionBy()
    tasks.groupBy("host").agg(
        count(lit(1)).as("n_tasks"),
        sum("duration_ms").as("task_ms"),
        sum("input_bytes").as("input_bytes"),
        sum("failed").as("failed_n"))
      .withColumn("cluster_tasks", sum("n_tasks").over(all))
      .withColumn("cluster_failed", sum("failed_n").over(all))
      .select(col("host"), col("n_tasks"), col("task_ms"),
        col("input_bytes"), col("failed_n"),
        r4(col("n_tasks") * lit(1.0) / col("cluster_tasks")).as("task_share"),
        r4(col("failed_n") * lit(1.0) / col("n_tasks")).as("failure_rate"),
        r4(when(col("cluster_failed") > 0,
          (col("failed_n") * lit(1.0) * col("cluster_tasks"))
            / (col("n_tasks") * lit(1.0) * col("cluster_failed"))))
          .as("failure_concentration"))
      .orderBy("host")
  }

  val hostHotspotsOracle: String = canonCte + """
, t AS (
  SELECT host, duration_ms, input_bytes,
         CASE WHEN end_reason IS NOT NULL AND end_reason <> 'Success'
              THEN 1 ELSE 0 END AS failed
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
    AND host IS NOT NULL AND duration_ms IS NOT NULL),
per_host AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_tasks,
         CAST(SUM(duration_ms) AS BIGINT) AS task_ms,
         CAST(SUM(input_bytes) AS BIGINT) AS input_bytes,
         CAST(SUM(failed) AS BIGINT) AS failed_n
  FROM t GROUP BY host),
tot AS (
  SELECT host, n_tasks, task_ms, input_bytes, failed_n,
         CAST(SUM(n_tasks) OVER () AS BIGINT) AS cluster_tasks,
         CAST(SUM(failed_n) OVER () AS BIGINT) AS cluster_failed
  FROM per_host)
SELECT host, n_tasks, task_ms, input_bytes, failed_n,
       FLOOR((n_tasks * 1.0 / cluster_tasks) * 10000.0 + 0.5) / 10000.0 AS task_share,
       FLOOR((failed_n * 1.0 / n_tasks) * 10000.0 + 0.5) / 10000.0 AS failure_rate,
       CASE WHEN cluster_failed > 0 THEN
         FLOOR(((failed_n * 1.0 * cluster_tasks) / (n_tasks * 1.0 * cluster_failed))
               * 10000.0 + 0.5) / 10000.0
       END AS failure_concentration
FROM tot
ORDER BY host"""

  /** Per-app peak task concurrency by interval sweep-line: each task
   *  contributes +1 at start (`end − duration`) and −1 at end; the
   *  running sum's maximum is the realized parallelism ceiling, and
   *  `peak_at_us` is the first instant it is reached. Read next to
   *  allocated cores this answers "did the app ever USE the executors
   *  it held?" — the complement of [[graft.analytics.Trends]]'
   *  ratio-based cpu_util (average utilization hides a spiky profile;
   *  the sweep shows it). Tie rule: at equal timestamps ends (−1)
   *  order before starts (+1), so back-to-back tasks don't double-
   *  count — encoded as `ORDER BY ts, delta, task_id`, a total order
   *  both engines sort identically. Scale shape: one shuffle by
   *  app_id for the per-app ordered running sum (per-app cardinality,
   *  not corpus-wide), then the peak lookup joins a broadcast-sized
   *  per-app aggregate. */
  def concurrencyProfile(canon: DataFrame): DataFrame = {
    val te = canon
      .filter(col("event_type") === TaskEnd && col("duration_ms").isNotNull)
      .select(col("app_id"), col("task_id"),
        (col("event_time_us") - col("duration_ms") * 1000L).as("start_us"),
        col("event_time_us").as("end_us"))
    val deltas = te.select(col("app_id"), col("task_id"),
        col("start_us").as("ts_us"), lit(1L).as("delta"))
      .unionByName(te.select(col("app_id"), col("task_id"),
        col("end_us").as("ts_us"), lit(-1L).as("delta")))
    val w = Window.partitionBy("app_id")
      .orderBy(col("ts_us"), col("delta"), col("task_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = deltas.withColumn("conc", sum("delta").over(w))
    val peaks = cum.groupBy("app_id").agg(
      sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_tasks"),
      max("conc").as("peak_concurrency"))
    cum.join(broadcast(peaks), "app_id")
      .filter(col("conc") === col("peak_concurrency"))
      .groupBy("app_id", "n_tasks", "peak_concurrency")
      .agg(min("ts_us").as("peak_at_us"))
      .select(col("app_id"), col("n_tasks"), col("peak_concurrency"),
        col("peak_at_us"))
      .orderBy("app_id")
  }

  val concurrencyProfileOracle: String = canonCte + """
, te AS (
  SELECT app_id, task_id,
         event_time_us - duration_ms * 1000 AS start_us,
         event_time_us AS end_us
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd' AND duration_ms IS NOT NULL),
deltas AS (
  SELECT app_id, task_id, start_us AS ts_us, 1 AS delta FROM te
  UNION ALL
  SELECT app_id, task_id, end_us AS ts_us, -1 AS delta FROM te),
cum AS (
  SELECT app_id, ts_us, delta,
         CAST(SUM(delta) OVER (PARTITION BY app_id
           ORDER BY ts_us, delta, task_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
  FROM deltas),
peaks AS (
  SELECT app_id,
         CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tasks,
         CAST(MAX(conc) AS BIGINT) AS peak_concurrency
  FROM cum GROUP BY app_id)
SELECT c.app_id, p.n_tasks, p.peak_concurrency,
       CAST(MIN(c.ts_us) AS BIGINT) AS peak_at_us
FROM cum c JOIN peaks p
  ON c.app_id = p.app_id AND c.conc = p.peak_concurrency
GROUP BY c.app_id, p.n_tasks, p.peak_concurrency
ORDER BY c.app_id"""

  /** Per-stage shuffle-BYTES skew — [[stragglerStages]] sees time skew,
   *  this sees the data skew that causes it (one reducer dragging 10×
   *  its share of shuffle input is the classic AQE-skew-join /
   *  salting trigger, visible long before the duration blows up).
   *  `max * n / sum` is the max-vs-mean ratio computed from integer
   *  sums only — no float accumulation, exact under any aggregation
   *  order. One map-side-combining aggregation, stages under minTasks
   *  excluded as noise. */
  def shuffleSkew(canon: DataFrame, minTasks: Long = 5L,
                  skewThreshold: Double = 2.0): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("stage_id").isNotNull &&
        col("shuffle_read_bytes").isNotNull)
      .select("app_id", "stage_id", "shuffle_read_bytes", "shuffle_write_bytes")
    tasks.groupBy("app_id", "stage_id").agg(
      count(lit(1)).as("task_n"),
      sum("shuffle_read_bytes").as("sum_read_bytes"),
      max("shuffle_read_bytes").as("max_read_bytes"),
      sum("shuffle_write_bytes").as("sum_write_bytes"),
      max("shuffle_write_bytes").as("max_write_bytes"))
      .filter(col("task_n") >= minTasks)
      .select(
        col("app_id"), col("stage_id"), col("task_n"),
        col("sum_read_bytes"), col("max_read_bytes"),
        col("sum_write_bytes"), col("max_write_bytes"),
        r4(when(col("sum_read_bytes") > 0,
          col("max_read_bytes") * lit(1.0) * col("task_n") / col("sum_read_bytes")))
          .as("read_skew"),
        r4(when(col("sum_write_bytes") > 0,
          col("max_write_bytes") * lit(1.0) * col("task_n") / col("sum_write_bytes")))
          .as("write_skew"),
        when(col("sum_read_bytes") > 0 &&
          col("max_read_bytes") * lit(1.0) * col("task_n") / col("sum_read_bytes")
            >= skewThreshold, 1L).otherwise(0L).as("is_skewed"))
      .orderBy("app_id", "stage_id")
  }

  val shuffleSkewOracle: String = canonCte + """
, t AS (
  SELECT app_id, stage_id, shuffle_read_bytes, shuffle_write_bytes
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd'
    AND stage_id IS NOT NULL AND shuffle_read_bytes IS NOT NULL),
agg AS (
  SELECT app_id, stage_id,
         CAST(COUNT(*) AS BIGINT) AS task_n,
         CAST(SUM(shuffle_read_bytes) AS BIGINT) AS sum_read_bytes,
         MAX(shuffle_read_bytes) AS max_read_bytes,
         CAST(SUM(shuffle_write_bytes) AS BIGINT) AS sum_write_bytes,
         MAX(shuffle_write_bytes) AS max_write_bytes
  FROM t GROUP BY app_id, stage_id)
SELECT app_id, stage_id, task_n, sum_read_bytes, max_read_bytes,
       sum_write_bytes, max_write_bytes,
       FLOOR((CASE WHEN sum_read_bytes > 0
              THEN max_read_bytes * 1.0 * task_n / sum_read_bytes END) * 10000.0 + 0.5) / 10000.0 AS read_skew,
       FLOOR((CASE WHEN sum_write_bytes > 0
              THEN max_write_bytes * 1.0 * task_n / sum_write_bytes END) * 10000.0 + 0.5) / 10000.0 AS write_skew,
       CAST(CASE WHEN sum_read_bytes > 0
                  AND max_read_bytes * 1.0 * task_n / sum_read_bytes >= 2.0
             THEN 1 ELSE 0 END AS BIGINT) AS is_skewed
FROM agg
WHERE task_n >= 5
ORDER BY app_id, stage_id"""

  /** Task-outcome breakdown per app: how tasks ended (Success /
   *  ExceptionFailure / …), each reason's share of the app's tasks,
   *  and the failed-task millisecond mass — the first cut of a
   *  reliability dashboard and the denominator for retry-budget
   *  tuning. One partial aggregation to (app, reason) cardinality,
   *  then a per-app share window over those FEW rows (reasons per
   *  app, not tasks — the window input is already collapsed). */
  def failureBreakdown(canon: DataFrame): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("end_reason").isNotNull)
      .select("app_id", "end_reason", "duration_ms")
    val perReason = tasks.groupBy("app_id", "end_reason").agg(
      count(lit(1)).as("n_tasks"),
      sum("duration_ms").as("task_ms"))
    perReason
      .withColumn("app_tasks",
        sum("n_tasks").over(Window.partitionBy("app_id")))
      .select(
        col("app_id"), col("end_reason"), col("n_tasks"), col("task_ms"),
        r4(col("n_tasks") * lit(1.0) / col("app_tasks")).as("share"),
        when(col("end_reason") =!= "Success", 1L).otherwise(0L).as("is_failure"))
      .orderBy("app_id", "end_reason")
  }

  val failureBreakdownOracle: String = canonCte + """
, t AS (
  SELECT app_id, end_reason, duration_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd' AND end_reason IS NOT NULL),
per_reason AS (
  SELECT app_id, end_reason,
         CAST(COUNT(*) AS BIGINT) AS n_tasks,
         CAST(SUM(duration_ms) AS BIGINT) AS task_ms
  FROM t GROUP BY app_id, end_reason)
SELECT app_id, end_reason, n_tasks, task_ms,
       FLOOR((n_tasks * 1.0 / SUM(n_tasks) OVER (PARTITION BY app_id)) * 10000.0 + 0.5) / 10000.0 AS share,
       CAST(CASE WHEN end_reason <> 'Success' THEN 1 ELSE 0 END AS BIGINT) AS is_failure
FROM per_reason
ORDER BY app_id, end_reason"""

  /** Task-LOCALITY breakdown per app — the data-placement twin of
   *  [[failureBreakdown]]: how much task time ran PROCESS_LOCAL vs
   *  NODE_LOCAL / RACK_LOCAL / ANY. Rising non-local share is the
   *  first symptom of cache-executor mismatch or HDFS block
   *  imbalance, and the task_ms column prices it (a thousand 10 ms
   *  ANY tasks matter less than ten 100 s ones). `is_local` flags the
   *  PROCESS_LOCAL row so a dashboard can one-filter the loss rows.
   *  Scale shape: one map-side-combining groupBy collapsing tasks to
   *  (app x <=5 levels) cardinality; the share window runs over that
   *  tiny aggregate, never over tasks. */
  def localityBreakdown(canon: DataFrame): DataFrame = {
    val tasks = canon
      .filter(col("event_type") === TaskEnd && col("locality").isNotNull)
      .select("app_id", "locality", "duration_ms")
    val perLevel = tasks.groupBy("app_id", "locality").agg(
      count(lit(1)).as("n_tasks"),
      sum("duration_ms").as("task_ms"))
    perLevel
      .withColumn("app_tasks",
        sum("n_tasks").over(Window.partitionBy("app_id")))
      .select(
        col("app_id"), col("locality"), col("n_tasks"), col("task_ms"),
        r4(col("n_tasks") * lit(1.0) / col("app_tasks")).as("share"),
        when(col("locality") === "PROCESS_LOCAL", 1L).otherwise(0L)
          .as("is_local"))
      .orderBy("app_id", "locality")
  }

  val localityBreakdownOracle: String = canonCte + """
, t AS (
  SELECT app_id, locality, duration_ms
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd' AND locality IS NOT NULL),
per_level AS (
  SELECT app_id, locality,
         CAST(COUNT(*) AS BIGINT) AS n_tasks,
         CAST(SUM(duration_ms) AS BIGINT) AS task_ms
  FROM t GROUP BY app_id, locality)
SELECT app_id, locality, n_tasks, task_ms,
       FLOOR((n_tasks * 1.0 / SUM(n_tasks) OVER (PARTITION BY app_id)) * 10000.0 + 0.5) / 10000.0 AS share,
       CAST(CASE WHEN locality = 'PROCESS_LOCAL' THEN 1 ELSE 0 END AS BIGINT) AS is_local
FROM per_level
ORDER BY app_id, locality"""

  /** Sessionization: group a user's events into sessions split at
   *  inactivity gaps > gapUs. The classic lag-flag-cumsum window
   *  shape — one shuffle on the user key, everything else
   *  in-partition; the same query sessionizes clickstreams at any
   *  scale. */
  def userSessions(canon: DataFrame, gapUs: Long = 1800L * 1000000L): DataFrame = {
    val byUser = Window.partitionBy("app_user").orderBy("event_time_us", "event_id")
    val flagged = canon
      .filter(col("app_user").isNotNull && col("event_time_us").isNotNull)
      .select("app_user", "event_time_us", "event_id")
      .withColumn("prev_us", lag("event_time_us", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("event_time_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_session").over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("app_user", "session_idx").agg(
      min("event_time_us").as("session_start_us"),
      max("event_time_us").as("session_end_us"),
      count(lit(1)).as("n_events"))
      .withColumn("duration_ms",
        ((col("session_end_us") - col("session_start_us")) / 1000.0).cast("long"))
      .orderBy("app_user", "session_idx")
  }

  val userSessionsOracle: String = canonCte + """
, flagged AS (
  SELECT app_user, event_time_us, event_id,
         CASE WHEN LAG(event_time_us, 1) OVER w IS NULL
                OR event_time_us - LAG(event_time_us, 1) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM canon
  WHERE app_user IS NOT NULL AND event_time_us IS NOT NULL
  WINDOW w AS (PARTITION BY app_user ORDER BY event_time_us, event_id)),
sessions AS (
  SELECT app_user, event_time_us,
         SUM(new_session) OVER (PARTITION BY app_user
           ORDER BY event_time_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged)
SELECT app_user, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(event_time_us) AS session_start_us,
       MAX(event_time_us) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(TRUNC((MAX(event_time_us) - MIN(event_time_us)) / 1000.0) AS BIGINT) AS duration_ms
FROM sessions
GROUP BY app_user, session_idx
ORDER BY app_user, session_idx"""

  /** Per-stage spill analysis: which stages overflow execution memory
   *  (the direct "raise `spark.sql.shuffle.partitions` / executor
   *  memory, or salt this key" advisory — `shuffle_skew` says the
   *  bytes are imbalanced, this says memory actually gave out).
   *  Reports per (app, stage): task count, tasks that spilled, memory
   *  + disk spill mass, the shuffle-write mass for scale context, and
   *  spill amplification = spilled bytes / shuffle-written bytes. One
   *  map-side-combining aggregation to stage cardinality; only stages
   *  that spilled at all are emitted (the advisory set, not a full
   *  inventory — `mem_usage` already publishes per-app totals).
   *  Cf. reference executor-metric aggregation
   *  (`duckdb_store_backup.rs` memory-metrics spec). */
  def spillStages(canon: DataFrame): DataFrame =
    canon
      .filter(col("event_type") === TaskEnd && col("stage_id").isNotNull)
      .groupBy("app_id", "stage_id").agg(
        count(lit(1)).as("task_n"),
        sum(when(coalesce(col("memory_spilled_bytes"), lit(0L)) +
          coalesce(col("disk_spilled_bytes"), lit(0L)) > 0, 1L)
          .otherwise(0L)).as("spilled_tasks"),
        coalesce(sum("memory_spilled_bytes"), lit(0L)).as("memory_spill_bytes"),
        coalesce(sum("disk_spilled_bytes"), lit(0L)).as("disk_spill_bytes"),
        coalesce(sum("shuffle_write_bytes"), lit(0L)).as("shuffle_write_bytes"))
      .filter(col("memory_spill_bytes") + col("disk_spill_bytes") > 0)
      .select(col("app_id"), col("stage_id"), col("task_n"),
        col("spilled_tasks"), col("memory_spill_bytes"),
        col("disk_spill_bytes"), col("shuffle_write_bytes"),
        r4(when(col("shuffle_write_bytes") > 0,
          (col("memory_spill_bytes") + col("disk_spill_bytes")) * lit(1.0)
            / col("shuffle_write_bytes"))).as("spill_amplification"))
      .orderBy("app_id", "stage_id")

  val spillStagesOracle: String = canonCte + """
, agg AS (
  SELECT app_id, stage_id,
         CAST(COUNT(*) AS BIGINT) AS task_n,
         CAST(SUM(CASE WHEN COALESCE(memory_spilled_bytes, 0)
                          + COALESCE(disk_spilled_bytes, 0) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS spilled_tasks,
         CAST(COALESCE(SUM(memory_spilled_bytes), 0) AS BIGINT) AS memory_spill_bytes,
         CAST(COALESCE(SUM(disk_spilled_bytes), 0) AS BIGINT) AS disk_spill_bytes,
         CAST(COALESCE(SUM(shuffle_write_bytes), 0) AS BIGINT) AS shuffle_write_bytes
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd' AND stage_id IS NOT NULL
  GROUP BY app_id, stage_id)
SELECT app_id, stage_id, task_n, spilled_tasks, memory_spill_bytes,
       disk_spill_bytes, shuffle_write_bytes,
       FLOOR((CASE WHEN shuffle_write_bytes > 0
              THEN (memory_spill_bytes + disk_spill_bytes) * 1.0 / shuffle_write_bytes
              END) * 10000.0 + 0.5) / 10000.0 AS spill_amplification
FROM agg
WHERE memory_spill_bytes + disk_spill_bytes > 0
ORDER BY app_id, stage_id"""

  /** Attempt-over-attempt regression: the same app's attempt 1 vs
   *  attempt 2 compared on task count, task-time mass, GC mass, and
   *  shuffle I/O — the "did the rerun get slower, and where" diff a
   *  history server answers when a nightly job is re-submitted. ONE
   *  conditional-aggregation pass (no self-join: each metric is a
   *  `sum(when(attempt=...))` pair, so the plan is a single map-side-
   *  combining aggregate to app cardinality); only apps that actually
   *  ran both attempts are compared. Ratio in a final double
   *  projection; all masses integer. */
  def attemptRegression(canon: DataFrame): DataFrame = {
    def side(a: String, c: String) =
      coalesce(sum(when(col("attempt_id") === a, col(c))), lit(0L))
    canon
      .filter(col("event_type") === TaskEnd && col("attempt_id").isNotNull)
      .groupBy("app_id").agg(
        sum(when(col("attempt_id") === "1", 1L).otherwise(0L)).as("a1_tasks"),
        sum(when(col("attempt_id") === "2", 1L).otherwise(0L)).as("a2_tasks"),
        side("1", "run_time_ms").as("a1_ms"),
        side("2", "run_time_ms").as("a2_ms"),
        side("1", "gc_time_ms").as("a1_gc_ms"),
        side("2", "gc_time_ms").as("a2_gc_ms"),
        side("1", "shuffle_read_bytes").as("a1_shuffle_read_bytes"),
        side("2", "shuffle_read_bytes").as("a2_shuffle_read_bytes"))
      .filter(col("a1_tasks") > 0 && col("a2_tasks") > 0)
      .select(col("app_id"), col("a1_tasks"), col("a2_tasks"),
        col("a1_ms"), col("a2_ms"),
        (col("a2_ms") - col("a1_ms")).as("delta_ms"),
        r4(when(col("a1_ms") > 0, col("a2_ms") * lit(1.0) / col("a1_ms")))
          .as("ms_ratio"),
        col("a1_gc_ms"), col("a2_gc_ms"),
        col("a1_shuffle_read_bytes"), col("a2_shuffle_read_bytes"))
      .orderBy("app_id")
  }

  val attemptRegressionOracle: String = canonCte + """
, agg AS (
  SELECT app_id,
         CAST(SUM(CASE WHEN attempt_id = '1' THEN 1 ELSE 0 END) AS BIGINT) AS a1_tasks,
         CAST(SUM(CASE WHEN attempt_id = '2' THEN 1 ELSE 0 END) AS BIGINT) AS a2_tasks,
         CAST(COALESCE(SUM(CASE WHEN attempt_id = '1' THEN run_time_ms END), 0) AS BIGINT) AS a1_ms,
         CAST(COALESCE(SUM(CASE WHEN attempt_id = '2' THEN run_time_ms END), 0) AS BIGINT) AS a2_ms,
         CAST(COALESCE(SUM(CASE WHEN attempt_id = '1' THEN gc_time_ms END), 0) AS BIGINT) AS a1_gc_ms,
         CAST(COALESCE(SUM(CASE WHEN attempt_id = '2' THEN gc_time_ms END), 0) AS BIGINT) AS a2_gc_ms,
         CAST(COALESCE(SUM(CASE WHEN attempt_id = '1' THEN shuffle_read_bytes END), 0) AS BIGINT) AS a1_shuffle_read_bytes,
         CAST(COALESCE(SUM(CASE WHEN attempt_id = '2' THEN shuffle_read_bytes END), 0) AS BIGINT) AS a2_shuffle_read_bytes
  FROM canon
  WHERE event_type = 'SparkListenerTaskEnd' AND attempt_id IS NOT NULL
  GROUP BY app_id)
SELECT app_id, a1_tasks, a2_tasks, a1_ms, a2_ms,
       a2_ms - a1_ms AS delta_ms,
       FLOOR((CASE WHEN a1_ms > 0 THEN a2_ms * 1.0 / a1_ms END) * 10000.0 + 0.5) / 10000.0 AS ms_ratio,
       a1_gc_ms, a2_gc_ms, a1_shuffle_read_bytes, a2_shuffle_read_bytes
FROM agg
WHERE a1_tasks > 0 AND a2_tasks > 0
ORDER BY app_id"""
}
