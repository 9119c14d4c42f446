package graft.streaming

/**
 * Per-trigger state-write overlap (optimization guide §2.6): a
 * streaming micro-batch ends in several parquet appends that are
 * sequential ONLY because the driver calls them sequentially — the
 * pairs/stats append is independent of the survivor chain once the
 * shared cache is filled, and sibling state appends are independent
 * of each other. Submitting them as concurrent driver jobs lets one
 * write's task tail back-fill with the next write's tasks.
 *
 * Contract: the caller MUST materialize any shared cached frame
 * (`.count()`) before handing dependent writes to `overlap`, so the
 * concurrent jobs read the cache instead of racing to fill it.
 * Replay semantics are unchanged — every write is the same
 * idempotent append, and the family's at-least-once contract already
 * tolerates a crash between ANY two of them (re-appended rows are
 * exact duplicates, folded by each store's read/compaction).
 */
private[graft] object StateWrites {
  def overlap(writes: (() => Unit)*): Unit = {
    if (writes.size <= 1) { writes.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(writes.size, 3))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fs = writes.map(w => scala.concurrent.Future(w()))
      fs.foreach(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
  }
}
