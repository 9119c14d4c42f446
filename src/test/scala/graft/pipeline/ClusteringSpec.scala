package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  import spark.implicits._

  test("connected components: chain, clique, and singleton-free merge") {
    // Components: {1,2,3,4} (a 3-hop chain), {10,11,12} (a triangle),
    // {20,21}. Min-label must traverse the full chain, not stop at
    // direct neighbors.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val lab = Clustering.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components converge regardless of edge orientation") {
    // Labels flow against the edge direction too (symmetrized):
    // high-id sources pointing at low-id targets.
    val pairs = Seq((5L, 1L), (9L, 5L), (9L, 7L)).toDF("doc_a", "doc_b")
    val lab = Clustering.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab.values.toSet === Set(1L))
    assert(lab.keySet === Set(1L, 5L, 7L, 9L))
  }

  test("dedupClusters groups near-dups under one survivor with sizes") {
    // 0, 1, 5 are pairwise near-dups (one/two word edits); 2 shares no
    // rare gram with anything and must not appear in the output at all.
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today", "en", "s0", 70L),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight", "en", "s0", 72L),
      (5L, "a quick brown fox jumps over the lazy dog near the river bank tonight", "en", "s0", 71L),
      (2L, "completely different content about spark data processing at massive scale", "en", "s1", 74L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Clustering.dedupClusters(docs).collect()
    val byDoc = out.map(r => r.getLong(1) ->
      (r.getLong(0), r.getLong(2), r.getLong(3))).toMap
    assert(byDoc.keySet === Set(0L, 1L, 5L))
    assert(byDoc(0L) === ((0L, 3L, 1L))) // cluster 0, size 3, survivor
    assert(byDoc(1L) === ((0L, 3L, 0L)))
    assert(byDoc(5L) === ((0L, 3L, 0L)))
  }

  test("dedupClusters composes: precomputed pair frame from ANY detector") {
    // a simhash/embedding/unioned pair frame drops straight in — the
    // docs frame is then only consulted for nothing at all (pairs carry
    // every id the clustering needs)
    val docs = Seq((0L, "irrelevant", "en", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Seq((7L, 8L), (8L, 9L), (30L, 31L)).toDF("doc_a", "doc_b")
    val out = Clustering.dedupClusters(docs, precomputedPairs = Some(pairs))
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(7L, 8L, 9L, 30L, 31L))
    assert(out(9L) === ((7L, 3L, 0L)))
    assert(out(30L) === ((30L, 2L, 1L)))
  }

  test("clusterCanonical keeps the longest copy, not the min-id one") {
    // Cluster {4,5,6}: doc 6 is the longest (a superset copy) so the
    // policy must pick it over min-id 4; cluster {10,11}: equal token
    // counts and equal distinct counts, so min doc_id 10 wins and the
    // policy AGREES with the default.
    val docs = Seq(
      (4L, "short", "en", "s0", 5L),
      (5L, "medium length copy", "en", "s0", 18L),
      (6L, "the longest superset copy with six", "en", "s0", 34L),
      (10L, "tie one alpha", "en", "s1", 13L),
      (11L, "tie one beta", "en", "s1", 12L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Seq((4L, 5L), (5L, 6L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Clustering.clusterCanonical(docs, precomputedPairs = Some(pairs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // cluster 4: canonical=6 (6 tokens), drops 1+3=4 tokens, differs
    assert(out(4L) === ((3L, 6L, 6L, 4L, 1L)))
    // cluster 10: both 3 tokens; 10 has 3 distinct, 11 has 3 distinct
    // -> min id 10, agrees with the default survivor
    assert(out(10L) === ((2L, 10L, 3L, 3L, 0L)))
  }

  test("reliable checkpoint mode produces identical components") {
    val dir = tmpDir("cc-checkpoint")
    spark.sparkContext.setCheckpointDir(dir)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val local = Clustering.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = Clustering.connectedComponents(pairs, reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel === local)
    assert(rel === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("bounded CC matches distributed CC; non-integral ids take the fallback") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    val bounded = Clustering.connectedComponentsBounded(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded === expect)
    // a null endpoint joins nothing in either engine; the bounded path
    // must not throw decoding it
    val withNull = pairs.unionByName(
      Seq((Some(7L), Option.empty[Long])).toDF("doc_a", "doc_b"))
    val boundedNull = Clustering.connectedComponentsBounded(withNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(boundedNull === expect)
    // string ids: the driver union-find is primitive-long, so the call
    // must route to the type-agnostic distributed fixpoint, same labels
    val strPairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("doc_a", "doc_b")
    val strOut = Clustering.connectedComponentsBounded(strPairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(strOut === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x"))
  }
}
