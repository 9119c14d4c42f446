package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinhashSigSpec extends SparkSpec {

  import spark.implicits._

  private def referenceSig(grams: Seq[String]): Option[Seq[Long]] = {
    if (grams.isEmpty) return None
    // independent spelling of sig[j] = min((a_j*gid + c_j) mod P)
    Some((0 until 16).map { j =>
      grams.map { g =>
        val gid = PolyHash.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(g))
        (gid * (37L + 101L * j) + (17L + 257L * j)) % 1000003L
      }.min
    })
  }

  test("minhash_sig matches the independent min-rule reference; empty input is null") {
    val cases = Seq(
      Seq.empty[String],
      Seq("alpha beta gamma"),
      Seq("the quick brown", "quick brown fox", "brown fox jumps"),
      Seq("ünïcödé ğram ✓", "café क्षत्रिय x"))
    for (grams <- cases) {
      val row = Seq(Tuple1(grams)).toDF("grams")
        .select(call_function("minhash_sig", col("grams")).as("sig"))
        .collect()(0)
      referenceSig(grams) match {
        case None => assert(row.isNullAt(0), grams)
        case Some(ref) => assert(row.getSeq[Long](0) === ref, grams)
      }
    }
  }

  test("expression path signatures equal the aggregation path's (poly family) per doc") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exprSig = docs
      .select(col("doc_id"),
        call_function("minhash_sig",
          call_function("word_ngrams", col("text"), lit(3))).as("sig"))
      .filter(col("sig").isNotNull)
    val aggSig = graft.pipeline.Dedup.minhashPolySignatures(docs)
      .select(col("doc_id"),
        array((0 until 16).map(j => col(s"mh$j")): _*).as("sig_agg"))
    val joined = exprSig.join(aggSig, Seq("doc_id"), "full_outer").collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"doc ${r.getLong(0)} present in only one path")
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("signature projection stays in one codegen span — no explode, agg, or exchange") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs
      .select(col("doc_id"),
        call_function("minhash_sig",
          call_function("word_ngrams", col("text"), lit(3))).as("sig"))
      .filter(col("sig").isNotNull)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(!plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
