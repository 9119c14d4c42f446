package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Round.r4

/**
 * Text-analysis operators for an LLM training-data pipeline, over the
 * `documents(doc_id, text, lang, source, n_chars)` table.
 *
 * All scores are derived from integer token/char counts so the DuckDB
 * oracles match hash-for-hash. Everything is a narrow projection or a
 * single explode+groupBy — no shuffles beyond the aggregation itself,
 * Catalyst-codegen'd built-ins only (no UDFs).
 */
object TextAnalysis {

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Whitespace token count, BPE-ish subword estimate (ceil(chars/4) —
   *  the standard ~4-chars-per-token heuristic), alpha-token count via
   *  regexp, avg token length. */
  def textStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("n_chars"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr("(n_chars + 3) div 4").as("bpe_tokens_est"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+', 0)")).cast("long")
        .as("alpha_tokens"),
      r4((col("n_chars") - (size(split(col("text"), " ")) - 1).cast("long"))
        * lit(1.0) / size(split(col("text"), " "))).as("avg_token_len"))
      .orderBy("doc_id")

  val textStatsOracle: String = """
SELECT doc_id, n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       (n_chars + 3) // 4 AS bpe_tokens_est,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+', 0)) AS BIGINT) AS alpha_tokens,
       FLOOR(((n_chars - (len(string_split(text, ' ')) - 1)) * 1.0
             / len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0 AS avg_token_len
FROM documents
ORDER BY doc_id"""

  /** Marker-word language heuristic: weighted stopword hits per
   *  candidate language, argmax with alphabetical tie-break, 'und' when
   *  no marker matches. (A real corpus would use a larger n-gram
   *  profile table; the mechanism — token explode, broadcast marker
   *  join, per-doc argmax — is the scale-relevant part.) */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = Seq(
      ("the", "en", 3L), ("a", "en", 1L),
      ("spark", "tech", 2L), ("data", "tech", 1L),
      ("le", "fr", 3L), ("la", "fr", 1L)).toDF("word", "cand_lang", "weight")
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val scores = toks.join(broadcast(markers), "word")
      .groupBy("doc_id", "cand_lang")
      .agg(sum("weight").as("score"))
    val best = scores
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("cand_lang"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("cand_lang"), col("score"))
    docs.select("doc_id").join(best, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("cand_lang"), lit("und")).as("lang_guess"),
        coalesce(col("score"), lit(0L)).as("lang_score"))
      .orderBy("doc_id")
  }

  val langIdOracle: String = """
WITH markers(word, cand_lang, weight) AS (
  VALUES ('the', 'en', 3), ('a', 'en', 1),
         ('spark', 'tech', 2), ('data', 'tech', 1),
         ('le', 'fr', 3), ('la', 'fr', 1)),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
scores AS (
  SELECT t.doc_id, m.cand_lang, CAST(SUM(m.weight) AS BIGINT) AS score
  FROM toks t JOIN markers m ON t.word = m.word
  GROUP BY t.doc_id, m.cand_lang),
best AS (
  SELECT doc_id, cand_lang, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rk
  FROM scores)
SELECT d.doc_id,
       COALESCE(b.cand_lang, 'und') AS lang_guess,
       COALESCE(b.score, 0) AS lang_score
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
  ON d.doc_id = b.doc_id
ORDER BY d.doc_id"""

  /** Quality score: length saturation + lexical diversity + stopword
   *  penalty + punctuation-noise penalty, all from integer counts. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    val nDistinct = size(array_distinct(split(col("text"), " "))).cast("long")
    val stopTok = size(expr(
      "filter(split(text, ' '), w -> w = 'the' OR w = 'a')")).cast("long")
    val punct = size(expr("regexp_extract_all(text, '[.,!?;:]', 0)")).cast("long")
    val lenScore = least(lit(1.0), col("n_chars") / lit(500.0))
    val divScore = nDistinct * lit(1.0) / nTok
    val stopRatio = stopTok * lit(1.0) / nTok
    val punctRatio = punct * lit(1.0) /
      when(col("n_chars") > 0, col("n_chars")).otherwise(lit(1L))
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nDistinct.as("n_distinct_tokens"),
      stopTok.as("n_stopwords"),
      punct.as("n_punct"),
      r4(lenScore).as("length_score"),
      r4(divScore).as("diversity_score"),
      r4(stopRatio).as("stopword_ratio"),
      r4(lit(0.4) * lenScore + lit(0.4) * divScore
        + lit(0.2) * (lit(1.0) - stopRatio) - punctRatio).as("quality"))
      .orderBy("doc_id")
  }

  val qualityScoreOracle: String = """
WITH q AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
         CAST(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a')) AS BIGINT) AS stop_tok,
         CAST(len(regexp_extract_all(text, '[.,!?;:]', 0)) AS BIGINT) AS punct
  FROM documents)
SELECT doc_id, n_tok AS n_tokens, n_distinct AS n_distinct_tokens,
       stop_tok AS n_stopwords, punct AS n_punct,
       FLOOR((LEAST(1.0, n_chars / 500.0)) * 10000.0 + 0.5) / 10000.0 AS length_score,
       FLOOR((n_distinct * 1.0 / n_tok) * 10000.0 + 0.5) / 10000.0 AS diversity_score,
       FLOOR((stop_tok * 1.0 / n_tok) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
       FLOOR((0.4 * LEAST(1.0, n_chars / 500.0)
             + 0.4 * (n_distinct * 1.0 / n_tok)
             + 0.2 * (1.0 - stop_tok * 1.0 / n_tok)
             - punct * 1.0 / (CASE WHEN n_chars > 0 THEN n_chars ELSE 1 END)) * 10000.0 + 0.5) / 10000.0 AS quality
FROM q
ORDER BY doc_id"""

  /** Document fingerprint: md5 over whitespace-normalised lowercase
   *  content. Used as the join key for exact dedup at scale. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(to_binary(lower(trim(regexp_replace(col("text"), "\\s+", " "))), lit("utf-8")))
        .as("content_fp"))
      .orderBy("doc_id")

  val fingerprintOracle: String = """
SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_fp
FROM documents
ORDER BY doc_id"""
}
