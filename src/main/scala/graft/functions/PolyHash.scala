package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: `poly_hash(s) -> bigint` — polynomial
 * rolling hash of a string's first 64 Unicode code points,
 * `sum(cp_i * 31^i) mod 1000003` (i zero-based), always in
 * `[0, 1000003)`.
 *
 * This is the 100 TB gram-id family of the near-dup pipeline: one
 * fused multiply-add loop per gram inside whole-stage codegen — no
 * cryptographic digest, no hex round-trip, no allocation — at the
 * cost class of `xxhash64`, BUT exactly reproducible in portable SQL
 * (a code-point/power-table sum; see `Dedup.polyGramIdSql`), so the
 * DuckDB oracle verifies the scale mode's fingerprints bit-for-bit —
 * unlike xxhash64, which no other engine reproduces.
 *
 * The 64-code-point cap bounds the power table the SQL mirror joins
 * against; word-3-gram shingles are far shorter, and for longer
 * inputs a 64-point prefix is still a perfectly good hash (documents
 * differing only past code point 64 collide, exactly like any
 * truncating hash family — harmless for min-hash/bit-vote use).
 *
 * Null input gives null. The modulus P = 1000003 matches
 * [[graft.pipeline.Dedup.Prime]]: downstream affine families
 * (a*gid + b) mod P stay inside Long range under ANSI arithmetic.
 */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_hash"

  override def nullSafeEval(s: Any): Any =
    PolyHash.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PolyHash.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val P = 1000003L
  val MaxCodePoints = 64

  /** Shared by interpreted eval and codegen (static-invoke pattern).
   *  Iterates CODE POINTS (not UTF-16 units) so the SQL mirror's
   *  per-character `ord()` sees the identical sequence. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var m = 1L
    var i = 0
    var n = 0
    while (i < str.length && n < MaxCodePoints) {
      val cp = str.codePointAt(i)
      h = (h + cp * m) % P
      m = (m * 31L) % P
      i += Character.charCount(cp)
      n += 1
    }
    h
  }
}
