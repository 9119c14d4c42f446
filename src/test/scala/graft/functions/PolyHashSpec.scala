package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class PolyHashSpec extends SparkSpec {

  import spark.implicits._

  private def reference(s: String): Long = {
    // independent spelling of sum(cp_i * 31^i) mod P over the first
    // 64 code points — the definition the DuckDB oracle mirrors
    val cps = s.codePoints().toArray.take(64)
    var h = java.math.BigInteger.ZERO
    val p = java.math.BigInteger.valueOf(1000003L)
    var m = java.math.BigInteger.ONE
    for (cp <- cps) {
      h = h.add(java.math.BigInteger.valueOf(cp.toLong).multiply(m)).mod(p)
      m = m.multiply(java.math.BigInteger.valueOf(31L)).mod(p)
    }
    h.longValueExact()
  }

  test("poly_hash matches the big-integer reference definition") {
    // includes combining marks (e + U+0301), a Devanagari cluster, and
    // astral-plane emoji + ZWJ — one grapheme, MANY code points; the
    // hash must see each code point (tools/poly_parity.py pins the
    // DuckDB mirror to the same sequence)
    for (s <- Seq("", "a", "the quick brown", "fox jumps over",
        "ünïcödé ğram ✓", "café क्षत्रिय", "a‍😀 ok",
        "x" * 200)) {
      assert(PolyHash.compute(UTF8String.fromString(s)) === reference(s), s)
    }
  }

  test("poly_hash is registered, codegen-evaluates, and stays in range") {
    val out = Seq("alpha beta gamma", "beta gamma delta", "alpha beta gamma")
      .toDF("g")
      .select(call_function("poly_hash", col("g")).as("h"))
      .collect().map(_.getLong(0))
    assert(out(0) === out(2)) // deterministic
    assert(out(0) !== out(1))
    assert(out.forall(h => h >= 0L && h < 1000003L))
  }

  test("poly_hash caps at 64 code points (truncating family)") {
    val a = PolyHash.compute(UTF8String.fromString("y" * 64))
    val b = PolyHash.compute(UTF8String.fromString("y" * 64 + "tail ignored"))
    assert(a === b)
  }

  test("null propagates") {
    val r = Seq((1, null: String)).toDF("i", "g")
      .select(call_function("poly_hash", col("g"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
