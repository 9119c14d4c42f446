package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (most-recent-match) join — the time-series join Spark has no
 * built-in operator for: each left row picks up the payload of the
 * LATEST right row with `rightTime <= leftTime` on equal keys
 * (inclusive, like DuckDB's `ASOF JOIN`; left rows with no prior
 * right row keep null payloads, like a left join).
 *
 * Implementation is the scale-correct UNION-WINDOW form, not a range
 * join: tag both sides, union them, and run one
 * `last(payload, ignoreNulls = true)` window over
 * (keys, time-ordered) rows. Cost is ONE shuffle on the key columns +
 * an in-partition sort — there is no join operator in the plan at
 * all (asserted in spec), so there is nothing to explode: a
 * range-join rewrite (`l.time >= r.time` theta join) degenerates to
 * per-key cartesian blow-up precisely when a key has many right-side
 * versions, which is exactly the 100 TB case (long-lived executors,
 * frequently updated dimensions).
 *
 * Tie rules: right rows sort BEFORE left rows at equal time
 * (inclusive semantics), and right-side ties on (key, time) resolve
 * to the greatest `tieBreak` value. Payload columns are filled
 * per-column (`last` with ignoreNulls); keep right payloads non-null
 * per row — the normal case — for row-atomic semantics.
 */
object AsofJoin {

  /** @param keys        equality key columns (present in both sides)
   *  @param timeCol     event-time column (present in both sides)
   *  @param payload     right-side columns to carry onto left rows
   *  @param tieBreak    column present in both sides giving right-side
   *                     ties a total order (e.g. an event id)
   *  @return left rows (all columns) + payload columns */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, payload: Seq[String],
               tieBreak: String): DataFrame = {
    val lOther = left.columns.toSeq.diff(keys :+ timeCol)
    val lpart = left.select(
      (keys :+ timeCol).map(col) ++
        Seq(lit(1L).as("__is_left"), col(tieBreak).cast("long").as("__tb")) ++
        lOther.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val rpart = right.select(
      (keys :+ timeCol).map(col) ++
        Seq(lit(0L).as("__is_left"), col(tieBreak).cast("long").as("__tb")) ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("__is_left"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lpart.unionByName(rpart)
      .select(
        (keys :+ timeCol).map(col) ++ Seq(col("__is_left")) ++ lOther.map(col) ++
          payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
      .filter(col("__is_left") === 1L)
      .drop("__is_left")
  }
}
