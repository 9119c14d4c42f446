package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input audit: a 100 TB corpus WILL contain null text,
  * empty strings, whitespace-only docs, and single-char fragments.
  * Every headline operator must process such rows without throwing
  * and without emitting nonsense rows (a null text is not a dup of
  * another null text's shingles — both have none). */
class EdgeInputSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, null.asInstanceOf[String], "en", "s0", 0L),
    (1L, "", "en", "s0", 0L),
    (2L, "   ", "en", "s1", 3L),
    (3L, "x", "en", "s1", 1L),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s2", 63L),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s2", 63L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("near-dup family tolerates null/empty/whitespace text") {
    val ngram = Dedup.dedupNgram(docs).collect()
    assert(ngram.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
    val mh = Dedup.dedupMinhash(docs).collect()
    assert(mh.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
    val sh = Dedup.dedupSimhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sh.contains((4L, 5L)))
    // degenerate docs share no shingles/fingerprints: no pair may
    // involve ids 0-3
    for (p <- ngram.map(r => (r.getLong(0), r.getLong(1))) ++ mh.map(r =>
        (r.getLong(0), r.getLong(1))) ++ sh)
      assert(p._1 >= 4L && p._2 >= 4L, p)
  }

  test("exact dedup groups the real twins; null and empty are distinct contents") {
    val out = Dedup.dedupExact(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("dup_count")).toMap
    assert(out(4L) === 2L) // 5 collapsed into 4
    assert(!out.contains(5L))
    // null text drops (no content to hash against); "" and "   " are
    // each their own singleton content
    assert(out.contains(1L) && out.contains(2L) && out.contains(3L))
  }

  test("text analysis scores degenerate docs without throwing") {
    assert(TextAnalysis.textStats(docs).count() >= 5)
    assert(TextAnalysis.qualityScore(docs).count() >= 5)
    assert(TextAnalysis.langId(docs).count() >= 5)
    assert(TextAnalysis.repetitionScore(docs).count() >= 5)
  }

  test("bpe trainer/encoder skip null and empty words") {
    val merges = TextAnalysis.bpeMerges(docs).collect()
    assert(merges.nonEmpty) // trained on the real docs only
    val enc = TextAnalysis.bpeEncode(docs).collect()
      .map(r => r.getLong(0)).toSet
    // docs with at least one word encode; null/empty/whitespace-only
    // (no words at all) yield no row
    assert(Set(3L, 4L, 5L).subsetOf(enc))
    assert(!enc.contains(0L) && !enc.contains(1L) && !enc.contains(2L))
  }

  test("perceptual and exact frame dedup tolerate empty payloads") {
    // doc_id % 3 == 2 selects videos: ids 2 (whitespace) and 5 (real)
    assert(Multimodal.frameDedupNear(docs, frameBytes = 64, stride = 2)
      .collect().forall(r => r.getLong(0) != r.getLong(2)))
    Multimodal.frameDedup(docs, frameBytes = 64, stride = 2).collect()
  }
}
