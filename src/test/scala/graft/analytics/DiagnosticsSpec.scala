package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics checks for the diagnostics family on hand-built frames —
  * exact nearest-rank picks, session gap boundaries, timeline
  * arithmetic — cases the synthetic-corpus oracle hits only by
  * accident. */
class DiagnosticsSpec extends SparkSpec {

  import spark.implicits._

  private def canonish(rows: Seq[(String, String, Long, java.lang.Long,
      java.lang.Long, java.lang.Long, String, String, Long)]) =
    rows.toDF("app_id", "event_type", "event_time_us", "duration_ms",
      "gc_time_ms", "stage_id", "executor_id", "app_user", "event_id")

  test("idle gaps: overlapping jobs merge into one island; a gap splits them") {
    // job1 [0,10], job2 [5,15] overlap -> island [0,15]; job3 [20,25]
    // second island. wall 25, busy 20, idle 5, idle_frac 0.2
    val rows = Seq(
      ("app-g", "SparkListenerJobStart", 0L, 1L),
      ("app-g", "SparkListenerJobEnd", 10L, 1L),
      ("app-g", "SparkListenerJobStart", 5L, 2L),
      ("app-g", "SparkListenerJobEnd", 15L, 2L),
      ("app-g", "SparkListenerJobStart", 20L, 3L),
      ("app-g", "SparkListenerJobEnd", 25L, 3L)
    ).toDF("app_id", "event_type", "event_time_us", "job_id")
    val out = Diagnostics.appIdleGaps(rows).collect()(0)
    assert(out.getAs[Long]("n_jobs") === 3L)
    assert(out.getAs[Long]("n_islands") === 2L)
    assert(out.getAs[Long]("wall_us") === 25L)
    assert(out.getAs[Long]("busy_us") === 20L)
    assert(out.getAs[Long]("idle_us") === 5L)
    assert(out.getAs[Double]("idle_frac") === 0.2)
  }

  test("host hotspots: failure concentration flags the host failing beyond its share") {
    // host-a: 8 tasks 1 failure; host-b: 2 tasks 1 failure
    // task shares 0.8/0.2; failure shares 0.5/0.5 -> concentration 0.625 / 2.5
    val rows = (1 to 8).map(i => ("app-h", "SparkListenerTaskEnd", 1000L + i,
        java.lang.Long.valueOf(10L), "host-a",
        if (i == 1) "ExceptionFailure" else "Success", 100L + i)) ++
      (1 to 2).map(i => ("app-h", "SparkListenerTaskEnd", 2000L + i,
        java.lang.Long.valueOf(10L), "host-b",
        if (i == 1) "ExceptionFailure" else "Success", 200L + i))
    val canon = rows.toDF("app_id", "event_type", "event_time_us",
      "duration_ms", "host", "end_reason", "input_bytes")
    val out = Diagnostics.hostHotspots(canon).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("host-a").getAs[Double]("failure_concentration") === 0.625)
    assert(out("host-b").getAs[Double]("failure_concentration") === 2.5)
    assert(out("host-b").getAs[Double]("failure_rate") === 0.5)
    assert(out("host-a").getAs[Double]("task_share") === 0.8)
  }

  test("concurrency sweep: ends at equal timestamps release before starts") {
    // task1 [0,10ms], task2 [5,15], task3 [15,25]: task3 begins the
    // instant task2 ends, so the peak stays 2 (at t=5ms), never 3
    val rows = Seq(
      ("app-c", "SparkListenerTaskEnd", 10000L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(1L)),
      ("app-c", "SparkListenerTaskEnd", 15000L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(2L)),
      ("app-c", "SparkListenerTaskEnd", 25000L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(3L))
    ).toDF("app_id", "event_type", "event_time_us", "duration_ms", "task_id")
    val out = Diagnostics.concurrencyProfile(rows).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_tasks") === 3L)
    assert(out(0).getAs[Long]("peak_concurrency") === 2L)
    assert(out(0).getAs[Long]("peak_at_us") === 5000L)
  }

  test("task quantiles pick exact nearest-rank elements") {
    // durations 10..100 step 10 (n=10): p50 idx = floor(0.5*9)+1 = 5 -> 50
    // p75 idx = floor(0.75*9)+1 = 7 -> 70; p95 idx = floor(0.95*9)+1 = 9 -> 90
    val rows = (1 to 10).map(i => ("app-q", "SparkListenerTaskEnd",
      1000L + i, java.lang.Long.valueOf(i * 10L), java.lang.Long.valueOf(i.toLong),
      java.lang.Long.valueOf(0L), "1", "u", i.toLong))
    val out = JobsStages.taskQuantiles(canonish(rows)).collect()(0)
    assert(out.getAs[Long]("task_n") === 10L)
    assert(out.getAs[Long]("p50_duration_ms") === 50L)
    assert(out.getAs[Long]("p75_duration_ms") === 70L)
    assert(out.getAs[Long]("p95_duration_ms") === 90L)
    assert(out.getAs[Long]("max_duration_ms") === 100L)
  }

  test("single-task app: every quantile is the one value") {
    val rows = Seq(("app-1", "SparkListenerTaskEnd", 1000L,
      java.lang.Long.valueOf(42L), java.lang.Long.valueOf(7L),
      java.lang.Long.valueOf(0L), "1", "u", 1L))
    val out = JobsStages.taskQuantiles(canonish(rows)).collect()(0)
    assert(out.getAs[Long]("p50_duration_ms") === 42L)
    assert(out.getAs[Long]("p95_duration_ms") === 42L)
    assert(out.getAs[Long]("max_gc_ms") === 7L)
  }

  test("straggler stage flags a planted 10x outlier; uniform stage clean") {
    val uniform = (1 to 9).map(i => ("app-s", "SparkListenerTaskEnd",
      1000L + i, java.lang.Long.valueOf(100L), java.lang.Long.valueOf(0L),
      java.lang.Long.valueOf(1L), "1", "u", i.toLong))
    val skewed = (1 to 8).map(i => ("app-s", "SparkListenerTaskEnd",
      2000L + i, java.lang.Long.valueOf(100L), java.lang.Long.valueOf(0L),
      java.lang.Long.valueOf(2L), "1", "u", 100L + i)) :+
      ("app-s", "SparkListenerTaskEnd", 2100L, java.lang.Long.valueOf(1000L),
        java.lang.Long.valueOf(0L), java.lang.Long.valueOf(2L), "1", "u", 199L)
    val out = Diagnostics.stragglerStages(canonish(uniform ++ skewed))
      .collect().map(r => r.getAs[Long]("stage_id") ->
        (r.getAs[Double]("skew_ratio"), r.getAs[Long]("is_skewed"))).toMap
    assert(out(1L) === ((1.0, 0L)))
    assert(out(2L) === ((10.0, 1L)))
  }

  test("sessions split exactly past the inactivity gap") {
    val gap = 1800L * 1000000L
    val rows = Seq(
      ("a", "E", 0L, null, null, null, null, "alice", 1L),
      ("a", "E", gap, null, null, null, null, "alice", 2L),       // gap == limit: same session
      ("a", "E", 2 * gap + 1, null, null, null, null, "alice", 3L) // gap+1: new session
    ).asInstanceOf[Seq[(String, String, Long, java.lang.Long, java.lang.Long,
      java.lang.Long, String, String, Long)]]
    val out = Diagnostics.userSessions(canonish(rows)).collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_events") === 2L)
    assert(out(1).getAs[Long]("n_events") === 1L)
  }

  test("executor timeline counts concurrent executors") {
    val rows = Seq(
      ("a", "SparkListenerExecutorAdded", 1L, null, null, null, "1", "u", 1L),
      ("a", "SparkListenerExecutorAdded", 2L, null, null, null, "2", "u", 2L),
      ("a", "SparkListenerExecutorRemoved", 3L, null, null, null, "1", "u", 3L),
      ("a", "SparkListenerExecutorAdded", 4L, null, null, null, "3", "u", 4L)
    ).asInstanceOf[Seq[(String, String, Long, java.lang.Long, java.lang.Long,
      java.lang.Long, String, String, Long)]]
    val out = Diagnostics.executorTimeline(canonish(rows))
      .collect().map(_.getAs[Long]("active_executors")).toSeq
    assert(out === Seq(1L, 2L, 1L, 2L))
  }
}
