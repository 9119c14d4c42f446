package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live per-application lifecycle state. */
case class AppLifecycle(
    app_id: String, started_at_us: Long, last_event_us: Long,
    n_events: Long, n_tasks: Long, completed: Boolean)

private[streaming] case class AppEventSlim(
    app_id: String, event_type: String, event_time_us: Long)

/**
 * Custom streaming state: tracks every application's lifecycle
 * (start time, last activity, task count, completion) across
 * micro-batches with `flatMapGroupsWithState` — the Spark-native
 * replacement for the reference's in-memory per-app bookkeeping in its
 * polling processor (reference: src/event_processor.rs:148-404).
 *
 * State is one small record per live application (bounded by app
 * count, not event volume); an update is emitted whenever an app's
 * state changes in a batch. This is the `KeyValueGroupedDataset`
 * custom-state path the analytics layer can subscribe to for a live
 * applications dashboard.
 */
object AppStateTracker {

  def track(canon: DataFrame): Dataset[AppLifecycle] = {
    val spark = canon.sparkSession
    import spark.implicits._
    canon
      .select(col("app_id"), col("event_type"), col("event_time_us"))
      .where(col("event_time_us").isNotNull)
      .as[AppEventSlim]
      .groupByKey(_.app_id)
      .flatMapGroupsWithState[AppLifecycle, AppLifecycle](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (appId, events, state: GroupState[AppLifecycle]) =>
          val prev = state.getOption.getOrElse(
            AppLifecycle(appId, Long.MaxValue, 0L, 0L, 0L, completed = false))
          var (start, last, n, tasks, done) =
            (prev.started_at_us, prev.last_event_us, prev.n_events,
              prev.n_tasks, prev.completed)
          events.foreach { e =>
            n += 1
            last = math.max(last, e.event_time_us)
            if (e.event_type == graft.events.EventModel.AppStart)
              start = math.min(start, e.event_time_us)
            if (e.event_type == graft.events.EventModel.TaskEnd) tasks += 1
            if (e.event_type == graft.events.EventModel.AppEnd) done = true
          }
          val next = AppLifecycle(appId,
            if (start == Long.MaxValue) 0L else start, last, n, tasks, done)
          state.update(next)
          Iterator.single(next)
      }
  }
}
