package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics checks for the app-lifecycle analytics (funnel ordering,
  * cohort/offset arithmetic) on hand-built frames — boundary cases
  * (job BEFORE the app start, week edges) the synthetic-corpus oracle
  * hits only by accident. */
class CrossAppLifecycleSpec extends SparkSpec {

  import spark.implicits._

  private val dayUs = 86400000000L

  test("app funnel: ordering is enforced, not mere presence") {
    // app-1 full funnel (start 0 -> job 100 -> task 200)
    // app-2 job BEFORE its start -> counted started only
    // app-3 start + job but task precedes the job -> stops at job
    // app-4 no start at all -> invisible everywhere
    val rows = Seq(
      ("app-1", "SparkListenerApplicationStart", 0L, null),
      ("app-1", "SparkListenerJobStart", 100L, null),
      ("app-1", "SparkListenerTaskEnd", 200L, "Success"),
      ("app-2", "SparkListenerJobStart", 50L, null),
      ("app-2", "SparkListenerApplicationStart", 60L, null),
      ("app-3", "SparkListenerApplicationStart", 0L, null),
      ("app-3", "SparkListenerJobStart", 300L, null),
      ("app-3", "SparkListenerTaskEnd", 250L, "Success"),
      ("app-4", "SparkListenerJobStart", 10L, null)
    ).map { case (a, t, us, r) => (a, t, us, Option(r)) }
      .toDF("app_id", "event_type", "event_time_us", "end_reason")
    val out = CrossApp.appFunnel(rows).collect()(0)
    assert(out.getAs[Long]("apps_started") === 3L)
    assert(out.getAs[Long]("apps_with_job") === 2L) // app-1, app-3
    assert(out.getAs[Long]("apps_with_task") === 1L) // app-1 only
    assert(out.getAs[Long]("job_conv_pm") === 666L)
    assert(out.getAs[Long]("task_conv_pm") === 333L)
    // mean start->job over app-1 (100us) and app-3 (300us) = 200us = 0.2ms
    assert(out.getAs[Double]("avg_start_to_job_ms") === 0.2)
  }

  test("failed tasks do not complete the funnel") {
    val rows = Seq(
      ("app-f", "SparkListenerApplicationStart", 0L, None),
      ("app-f", "SparkListenerJobStart", 10L, None),
      ("app-f", "SparkListenerTaskEnd", 20L, Some("ExceptionFailure"))
    ).toDF("app_id", "event_type", "event_time_us", "end_reason")
    val out = CrossApp.appFunnel(rows).collect()(0)
    assert(out.getAs[Long]("apps_with_job") === 1L)
    assert(out.getAs[Long]("apps_with_task") === 0L)
  }

  test("app retention: offset-0 equals cohort size; gaps stay absent") {
    // cohort week 0: app-a active weeks {0,1,3}, app-b active {0}
    // cohort week 2: app-c active {2,3}
    val rows = Seq(
      ("app-a", 0L), ("app-a", dayUs * 7 + 5L), ("app-a", dayUs * 21),
      ("app-a", 3L), // same week as first -> one distinct (app, week)
      ("app-b", dayUs * 2),
      ("app-c", dayUs * 14), ("app-c", dayUs * 25)
    ).toDF("app_id", "event_time_us")
    val out = CrossApp.appRetention(rows)
      .collect().map(r => ((r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset")),
        (r.getAs[Long]("active_apps"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retained_pm")))).toMap
    assert(out((0L, 0L)) === ((2L, 2L, 1000L)))
    assert(out((0L, 1L)) === ((1L, 2L, 500L)))
    assert(!out.contains((0L, 2L))) // no activity that week -> no row
    assert(out((0L, 3L)) === ((1L, 2L, 500L)))
    assert(out((2L, 0L)) === ((1L, 1L, 1000L)))
    assert(out((2L, 1L)) === ((1L, 1L, 1000L)))
  }
}
