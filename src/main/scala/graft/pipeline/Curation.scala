package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The composed end-to-end curation pipeline — the "user story" run a
 * training-data team executes per corpus snapshot, as ONE dataflow:
 *
 *   quality gate → exact dedup → near-dup cluster survivors →
 *   deterministic split → token-budget shard packing
 *
 * Each stage is the library operator it names (the quality expression
 * is [[TextAnalysis.qualityCol]], the survivor rule is
 * [[Clustering.connectedComponents]]' min-label, the split/pack are
 * [[Sampling.splitAssign]]/[[Sampling.shardPack]] invoked verbatim on
 * the curated set), so the composition cannot drift from the
 * individually-verified pieces. The output is the training manifest:
 * one row per SURVIVING doc with its split and shard assignment.
 *
 * Scale shape: stages 1-2 are a projection filter and one
 * hash-partitioned first-occurrence window; stage 3 is the bucketed
 * near-dup pair pass + closure (never all-pairs); stages 4-5 are pure
 * projections plus writer-lane windows. Nothing in the composition
 * adds an exchange beyond what the component operators already pay —
 * Catalyst fuses the filters into the shared scan.
 *
 * The DuckDB oracle composes the SAME factored CTE fragments
 * ([[Dedup.shinglesCte]] rebased onto the curated set,
 * [[Clustering.closureFromShingles]] unchanged), so the cross-engine
 * check covers the full five-stage dataflow end-to-end.
 */
object Curation {

  /** One row per surviving doc: doc_id, n_tok, split, writer,
   *  shard_idx. `minQuality` defaults to 0.6 — the corpus median sits
   *  near 0.62, so the gate meaningfully curates at every SF. */
  def curateCorpus(docs: DataFrame, minQuality: Double = 0.6,
                   trainPct: Int = 90, valPct: Int = 5,
                   budgetTokens: Long = 2000L, writers: Int = 8): DataFrame = {
    // 1. quality gate — pure projection filter, fused into the scan
    val scored = docs.withColumn("q", TextAnalysis.qualityCol)
      .filter(col("q") >= minQuality).drop("q")
    // 2. exact dedup — first occurrence per content hash (the
    //    dedupExact rule), computed as a NARROW pass: only
    //    (doc_id, hash) goes through the exchange+window, and the
    //    winning ids are cached (ids only — tiny) and semi-joined
    //    back. The four downstream consumers each re-derive `exact`,
    //    so with the window form every one re-paid a FULL-WIDTH text
    //    shuffle; with this form they pay a column-pruned scan plus a
    //    broadcast-able semi-join. (Caching the full-width curated
    //    frame instead was measured ~20% slower at sf0.1 —
    //    memory-store write + unpruned reads. A persistent pipeline
    //    would write the curated store to parquet.)
    val byContent = Window.partitionBy("h").orderBy("doc_id")
    val keepIds = scored
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("rn", row_number().over(byContent))
      .filter(col("rn") === 1).select("doc_id")
    val exact = scored.join(keepIds, Seq("doc_id"), "left_semi")
    // 3. near-dup clusters over the exact-deduped set; survivors only
    val pairs = Dedup.dedupNgram(exact).select("doc_a", "doc_b")
    val dropped = Clustering.componentsAuto(pairs)
      .filter(col("doc_id") =!= col("label")).select("doc_id")
    // r16: the survivor frame feeds BOTH stage 4 (split) and stage 5
    // (pack); left lazy, each consumer re-ran the whole quality gate +
    // exact-dedup window + anti-join chain. Pin the survivor ID SET
    // (ids only — tiny at any scale) and re-derive each consumer's
    // input as one column-pruned docs scan + a broadcast semi-join:
    // identical row set (survivor ids are a subset of the quality-
    // gated set, and split/pack read only doc_id/text, unchanged).
    val survivorIds = exact.select("doc_id")
      .join(dropped, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val survivors = docs.join(survivorIds, Seq("doc_id"), "left_semi")
    // 4+5. split + pack, the library operators verbatim on the final set
    val split = Sampling.splitAssign(survivors, trainPct, valPct)
      .select("doc_id", "split")
    val packed = Sampling.shardPack(survivors, budgetTokens, writers)
    packed.join(split, "doc_id")
      .select(col("doc_id"), col("n_tok"), col("split"), col("writer"),
        col("shard_idx"))
      .orderBy("doc_id")
  }

  val curateCorpusOracle: String = "WITH RECURSIVE scored AS (\n" +
    s"  SELECT doc_id, text, lang, source, n_chars FROM documents\n" +
    s"  WHERE ${TextAnalysis.qualitySqlExpr} >= 0.6),\n" + """
kept AS (
  SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT s.*, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM scored s)
  WHERE rn = 1),
""" + Dedup.shinglesCte.trim.replace("FROM documents", "FROM kept") + "," +
    Clustering.closureFromShingles + """,
surv AS (
  SELECT k.doc_id, k.text FROM kept k
  LEFT JOIN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id) d
    ON k.doc_id = d.doc_id
  WHERE d.doc_id IS NULL),
packed AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS writer,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) AS bucket
  FROM surv),
lanes AS (
  SELECT doc_id, n_tok, writer, bucket,
         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY writer ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM packed)
SELECT doc_id, n_tok,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       writer, cum_before // 2000 AS shard_idx
FROM lanes
ORDER BY doc_id"""
}
