package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Cross-engine-deterministic 4-decimal rounding.
  *
  * `round(x, 4)` is NOT portable: Spark rounds via BigDecimal on the
  * shortest decimal representation while DuckDB rounds in float math,
  * and on values within one ulp of a .00005 boundary they disagree
  * (observed: 0.59015 -> 0.5902 vs 0.5901 at sf0.1). `floor(x*1e4 +
  * 0.5)/1e4` is the same IEEE operation sequence in both engines, so
  * identical inputs give identical outputs everywhere. Every oracle
  * mirrors this exact formula.
  *
  * NOTE on negatives: this is round-half-UP (toward +infinity), not
  * half-away-from-zero — e.g. -0.00005 -> 0.0 where `round(x, 4)`
  * gives -0.0001. Both engines agree (the formula is mirrored), so
  * correctness is unaffected; it only matters if a metric's sign
  * convention must match the reference's rounding exactly. The one
  * negative-capable metric (`dsir_weights.avg_llr`) relies on exactly
  * this mirrored-formula agreement; use
  * `floor(abs(x)*1e4+0.5)*sign(x)/1e4` on BOTH sides if a metric ever
  * needs half-away-from-zero semantics.
  */
object Round {
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** The DuckDB spelling of [[r4]]. */
  def r4Sql(inner: String): String = s"FLOOR(($inner) * 10000.0 + 0.5) / 10000.0"
}
