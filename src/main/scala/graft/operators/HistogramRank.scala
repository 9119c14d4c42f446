package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The histogram-rank order-statistic discipline, shared by every
 *  nearest-rank quantile operator (task/stage/app-duration/length
 *  strips): the corpus partial-aggs to a bounded per-(keys, value)
 *  HISTOGRAM before any sort, the nearest-rank rule
 *  `floor(p*(n-1)) + 1` runs as a cumulative window over that
 *  histogram only, and the value at rank r is the histogram row with
 *  `cum_below < r <= cum_le`, picked by one conditional aggregate.
 *  No operator sorts corpus-cardinality rows: a 100 TB metric column
 *  collapses to at most |distinct values| rows per key before the
 *  (hash-partitioned, or single-row-bounded global) window.
 *
 *  Extracted so the next quantile operator cannot regress to a
 *  per-key `row_number` over raw rows; both the Spark chain and the
 *  DuckDB oracle CTE come from here, in lockstep by construction.
 *  `assertHistogramRankShape` (PlanAuditSpec) audits the physical
 *  plan of every consumer. */
object HistogramRank {

  /** Cumulative frame over a histogram `(keys..., value, cnt)`: adds
   *  `cum_le` (running count of members with metric <= value, within
   *  the key partition ordered by value) and `n` (partition total).
   *  Empty `keys` = one global partition — legal precisely because
   *  the input is a histogram (at most |distinct values| rows). */
  def cumulate(hist: DataFrame, keys: Seq[String], value: String): DataFrame = {
    val w =
      if (keys.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(keys.map(col): _*)
    hist
      .withColumn("cum_le", sum("cnt").over(w.orderBy(value)))
      .withColumn("n", sum("cnt").over(w))
  }

  /** Nearest-rank index for quantile `p` over `n` members: the sorted
   *  element at `floor(p*(n-1)) + 1` (1-based) — exact, integer,
   *  engine-portable (not a sketch). */
  def rankOf(p: Double): Column = floor(lit(p) * (col("n") - 1)) + 1

  /** Conditional-aggregate quantile pick over a [[cumulate]]d frame:
   *  the (unique) histogram row whose [cum_below, cum_le] span covers
   *  the rank; `gate` restricts to one metric of a stacked unpivot. */
  def at(value: String, p: Double, gate: Column = lit(true)): Column = {
    val r = rankOf(p)
    min(when(gate && col("cum_le") - col("cnt") < r && r <= col("cum_le"),
      col(value)))
  }

  /** DuckDB twin of [[cumulate]]: the `cum` CTE body over a histogram
   *  CTE named `histSrc` carrying `(keys..., value, cnt)`. */
  def cumCteSql(histSrc: String, keys: Seq[String], value: String): String = {
    val keyPrefix = keys.map(k => s"$k, ").mkString
    val partBy = if (keys.isEmpty) "" else s"PARTITION BY ${keys.mkString(", ")}"
    val orderClause = (partBy + s" ORDER BY $value").trim
    s"""cum AS (
  SELECT $keyPrefix$value, cnt,
         SUM(cnt) OVER ($orderClause) AS cum_le,
         SUM(cnt) OVER ($partBy) AS n
  FROM $histSrc)"""
  }

  /** DuckDB twin of [[at]]: one quantile-pick select-list line. */
  def pickSql(value: String, p: Double, alias: String,
              gateSql: String = ""): String = {
    val gate = if (gateSql.isEmpty) "" else s"$gateSql AND "
    s"MIN(CASE WHEN ${gate}cum_le - cnt < FLOOR($p * (n - 1)) + 1 " +
      s"AND FLOOR($p * (n - 1)) + 1 <= cum_le THEN $value END) AS $alias"
  }
}
