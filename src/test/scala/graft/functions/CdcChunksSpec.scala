package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcChunksSpec extends SparkSpec {

  import spark.implicits._

  /** Independent spelling of the whole chain: hash each token, cut
   *  BEFORE a token whose hash ≡ 0 (mod avg), order-encode. */
  private def reference(text: String, avg: Int): Seq[(Long, Long)] = {
    val toks = text.split(" ", -1)
    val hs = toks.map(w => PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var fp = 0L; var len = 0L
    for (gh <- hs) {
      if (gh % avg == 0 && len > 0) { out += ((fp, len)); fp = 0L; len = 0L }
      len += 1; fp += gh * len
    }
    if (len > 0) out += ((fp, len))
    out.toSeq
  }

  test("cdc_chunks matches the independent reference, conserves token mass, handles edges") {
    val cases = Seq(
      ("", 8),
      ("one", 8),
      ("the quick brown fox jumps over the lazy dog again and again", 8),
      // avg=1 cuts on EVERY token: one chunk per token
      ("a b c d", 1),
      ("x y z x y z x y z x y z", 4),
      ("unicode ünïcödé ğram ✓ café क्षत्रिय a‍😀 ok", 2))
    for ((text, avg) <- cases) {
      val got = Seq(Tuple1(text)).toDF("text")
        .select(explode(call_function("cdc_chunks", col("text"), lit(avg)))
          .as("ch"))
        .select(col("ch.fp"), col("ch.len"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === reference(text, avg), s"'$text' avg=$avg")
      // every token lands in exactly one chunk
      assert(got.map(_._2).sum === text.split(" ", -1).length.toLong,
        s"'$text' avg=$avg mass")
    }
  }

  test("expression path equals the window-chain occurrence frame per doc, in order") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    // occ_key is doc-major/position-minor in BOTH paths, so sorting
    // by it aligns the two sequences doc by doc, chunk by chunk —
    // the per-occurrence parity the shared-oracle contract rests on
    def seqOf(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("occ_key")
      .select("doc_id", "fp", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = seqOf(graft.pipeline.Dedup.cdcOccurrences(docs, 8, Nil))
    val b = seqOf(graft.pipeline.Dedup.cdcOccurrencesExpr(docs, 8, Nil))
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("chunking runs inside one codegen span before the explode — no window, no exchange") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.pipeline.Dedup.cdcOccurrencesExpr(docs, 8, Nil)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Generate"), plan) // the chunk-set explode
  }
}
