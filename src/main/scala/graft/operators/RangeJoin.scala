package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Generic point-in-interval (range) join — the second classic
 * time-series join Spark's built-ins can't express without a
 * cartesian blow-up (the first, as-of, is [[AsofJoin]]). A naive
 * `points JOIN intervals ON key AND ts BETWEEN start AND end` plans
 * as an equi-join on the key followed by a per-key all-pairs filter —
 * quadratic whenever one key holds many points AND many intervals
 * (exactly the hot-key case at scale).
 *
 * Banded blocking instead: time is cut into fixed `bucketWidth`
 * buckets; each point lives in exactly ONE bucket (a pure
 * projection) and each interval is exploded to every bucket its span
 * touches (in-row `sequence` fan-out, bounded by span/width + 1).
 * The join is then a plain equi-join on (keys..., bucket) with the
 * exact BETWEEN as a post-filter — each matching pair meets in
 * exactly one bucket (the point's), so the output needs NO distinct.
 * Pick `bucketWidth` near the typical interval span: fan-out stays
 * O(1) per interval while each bucket's candidate set stays local.
 * Cost is one shuffle of each side keyed on (keys, bucket) — the
 * shape that survives a 100x scale-up; skewed hot buckets split
 * further by shrinking the width (more buckets = more parallelism),
 * the knob a static hot-key salt cannot give an interval join.
 *
 * Matches an interval-join need the reference meets by letting DuckDB
 * plan BETWEEN predicates (duckdb_store_backup.rs's time-windowed
 * scans); here the blocking must be explicit because the data is
 * distributed.
 */
object RangeJoin {

  /** Inner point-in-interval join: every `points` row paired with each
   *  `intervals` row sharing `keys` whose `[startCol, endCol]` (both
   *  inclusive) contains `tsCol`. Unmatched points drop (callers
   *  wanting left semantics join the result back). All three bound
   *  columns must be the same integer timeline (epoch micros). */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                tsCol: String, startCol: String, endCol: String,
                bucketWidth: Long = 60L * 1000 * 1000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket", expr(s"$tsCol div $bucketWidth"))
    // degenerate end < start intervals must drop, not explode a
    // DESCENDING bucket sequence (Spark 4's sequence(a, b) counts down
    // when b < a instead of returning empty)
    val ib = intervals.filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(expr(s"sequence($startCol div $bucketWidth, $endCol div $bucketWidth)")))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
