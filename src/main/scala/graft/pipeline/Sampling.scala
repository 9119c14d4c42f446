package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Round.r4

/**
 * Dataset-splitting and stratified-selection operators for a
 * training-data pipeline.
 *
 * The split is a pure per-row projection on a content-independent
 * hash of the id — no shuffle, no sampling state, stable under
 * re-runs, reshards, and incremental appends (a doc's split never
 * changes when other docs arrive — the property `randomSplit` and
 * reservoir approaches lack). Bucket = first 8 md5 hex digits of the
 * id parsed base-16, mod 100: identical arithmetic in Spark
 * (`conv(hex, 16, 10)`) and DuckDB (`('0x' || hex)::UBIGINT`).
 */
object Sampling {

  private def bucket100(idCol: String) =
    (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 100L).as("bucket")

  /** Deterministic train/val/test assignment: bucket < trainPct →
   *  train; < trainPct + valPct → val; else test. */
  def splitAssign(docs: DataFrame, trainPct: Int = 90,
                  valPct: Int = 5): DataFrame =
    docs.select(col("doc_id"), bucket100("doc_id"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .orderBy("doc_id")

  val splitAssignOracle: String = """
WITH b AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) AS bucket
  FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id"""

  /** Token-budget shard packing: assign documents to training shards
   *  of ~`budgetTokens` tokens each — the layout step before writing
   *  tokenized training data, where a trainer wants shards of equal
   *  token (not document) size.
   *
   *  Scale shape: a single global running sum would be one worldwide
   *  sort into one window partition — the classic non-scaling shape —
   *  so packing is TWO-LEVEL, exactly like distributed shard writers
   *  work: docs hash deterministically to `writers` independent
   *  writer lanes (pure projection, no shuffle beyond the lane
   *  window's own exchange), and each lane runs its own running-sum
   *  cut into shards. A shard is (writer, shard_idx); each holds
   *  budget..budget+maxdoc tokens. Assignment is stable under
   *  append (a doc's lane never changes) though late arrivals extend
   *  their lane's LAST shard rather than re-cutting earlier ones —
   *  pack once per snapshot, like any shard writer. */
  def shardPack(docs: DataFrame, budgetTokens: Long = 2000L,
                writers: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % writers).as("writer"))
    val lane = Window.partitionBy("writer").orderBy("doc_id")
    toks
      .withColumn("cum_before", coalesce(
        sum("n_tok").over(lane.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), col("writer"), col("n_tok"),
        expr(s"cum_before div $budgetTokens").as("shard_idx"))
      .orderBy("doc_id")
  }

  /** Deterministic TRAINING-ORDER shuffle — the epoch order a data
   *  loader consumes — computed WITHOUT a global sort (the one shape a
   *  "shuffle the corpus" request must not take at 100 TB: a global
   *  rank is a worldwide sort into one ordering authority). Docs hash
   *  to `lanes` independent lanes (pure projection, the
   *  [[shardPack]] writer-lane discipline), each lane orders by the
   *  hash WITHIN itself — a per-lane window over ~1/lanes of the
   *  corpus, embarrassingly parallel — and the global position is the
   *  round-robin interleave `ord = pos_in_lane * lanes + lane`.
   *  Because the md5 hash is content-independent and per-doc, the
   *  order is stable under re-runs and reshards, reproducible from
   *  the doc id alone, and well-mixed across sources (hash order
   *  within a lane is already a shuffle — adjacent positions are
   *  unrelated docs). `ord` has gaps once shorter lanes exhaust
   *  (lanes differ in size by hash balance); consumers SORT by ord,
   *  so gaps are harmless — uniqueness is what matters, and
   *  pos*lanes+lane is injective. At scale, set `lanes` ~ the shard
   *  count so each lane's window fits one task comfortably. */
  def trainOrder(docs: DataFrame, lanes: Int = 8): DataFrame =
    docs.select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .withColumn("lane", col("h") % lanes)
      .withColumn("pos_in_lane",
        (row_number().over(Window.partitionBy("lane")
          .orderBy(col("h"), col("doc_id"))) - 1).cast("long"))
      .select(col("doc_id"), col("lane"), col("pos_in_lane"),
        (col("pos_in_lane") * lanes + col("lane")).as("ord"))
      .orderBy("doc_id")

  /** Same first-8-hex-digits md5 arithmetic as [[splitAssign]]'s
   *  bucket (the cross-engine-identical idiom). */
  val trainOrderOracle: String = """
WITH h AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) AS h
  FROM documents),
p AS (
  SELECT doc_id, h % 8 AS lane,
         CAST(ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT) AS pos_in_lane
  FROM h)
SELECT doc_id, lane, pos_in_lane,
       CAST(pos_in_lane * 8 + lane AS BIGINT) AS ord
FROM p
ORDER BY doc_id"""

  /** CTE chain producing the shard assignment
   *  `packed(doc_id, writer, n_tok, shard_idx)` — the SQL twin of
   *  [[shardPack]]'s body, shared by its oracle and the
   *  [[packStats]] rollup so the two can never drift. */
  val shardPackCte: String = """
t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 8 AS BIGINT) AS writer
  FROM documents),
c AS (
  SELECT doc_id, writer, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY writer ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t),
packed AS (
  SELECT doc_id, writer, n_tok, cum_before // 2000 AS shard_idx
  FROM c)"""

  val shardPackOracle: String = "WITH " + shardPackCte.trim + """
SELECT doc_id, writer, n_tok, shard_idx
FROM packed
ORDER BY doc_id"""

  /** Shard-pack balance ledger — the manifest a shard writer publishes
   *  after packing: one row per (writer, shard) with its doc count,
   *  token mass, and fill ratio against the budget. The spread of
   *  fill_ratio IS the packing-quality metric (every shard except each
   *  lane's last should sit in [1, 1 + maxdoc/budget)); a trainer
   *  reads this frame to catch pathological lanes before a run.
   *  One map-side-combining aggregation over [[shardPack]]'s
   *  assignment — output cardinality is the shard count, the true
   *  ledger size at any scale. */
  def packStats(docs: DataFrame, budgetTokens: Long = 2000L,
                writers: Int = 8): DataFrame =
    shardPack(docs, budgetTokens, writers)
      .groupBy("writer", "shard_idx").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("shard_tokens"))
      .select(col("writer"), col("shard_idx"), col("n_docs"),
        col("shard_tokens"),
        r4(col("shard_tokens") * lit(1.0) / budgetTokens).as("fill_ratio"))
      .orderBy("writer", "shard_idx")

  val packStatsOracle: String = "WITH " + shardPackCte.trim + """
SELECT writer, shard_idx,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
       FLOOR((SUM(n_tok) * 1.0 / 2000) * 10000.0 + 0.5) / 10000.0 AS fill_ratio
FROM packed
GROUP BY writer, shard_idx
ORDER BY writer, shard_idx"""

  /** Fixed-length training-sequence packing (concat-and-chunk) — the
   *  OTHER packing discipline a trainer runs: [[shardPack]] cuts at
   *  document boundaries into ~budget shards; this concatenates each
   *  writer lane's token stream and slices it into exact `seqLen`-token
   *  context windows, docs crossing cuts mid-document — the standard
   *  pre-training batch layout. Output is the per-sequence manifest:
   *  how many docs touch each window, how many BEGIN in it (= where a
   *  trainer resets attention masks / EOD loss), and its token fill
   *  (only each lane's last window is partial).
   *
   *  All integer: a doc occupies half-open token span [cum_before,
   *  cum_before + n_tok); its windows are span div seqLen, exploded
   *  with `sequence(first_seq, last_seq)` (ascending by construction —
   *  n_tok >= 1), overlap length by integer min/max. Scale shape: the
   *  running sum is per-LANE (same two-level discipline as
   *  [[shardPack]] — no global window), the explode fan-out per doc is
   *  bounded by n_tok/seqLen + 1 (total fan-out = corpus tokens /
   *  seqLen + docs), and the manifest aggregation partial-aggregates
   *  map-side on (writer, seq_idx). */
  def seqPack(docs: DataFrame, seqLen: Long = 512L,
              writers: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % writers).as("writer"))
    val lane = Window.partitionBy("writer").orderBy("doc_id")
    toks
      .withColumn("cum_before", coalesce(
        sum("n_tok").over(lane.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("first_seq", expr(s"cum_before div $seqLen"))
      .withColumn("last_seq", expr(s"(cum_before + n_tok - 1) div $seqLen"))
      .select(col("writer"), col("cum_before"), col("n_tok"), col("first_seq"),
        explode(expr("sequence(first_seq, last_seq)")).as("seq_idx"))
      .withColumn("tok_in_seq",
        least(col("cum_before") + col("n_tok"), (col("seq_idx") + lit(1L)) * lit(seqLen))
          - greatest(col("cum_before"), col("seq_idx") * lit(seqLen)))
      .groupBy("writer", "seq_idx")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("first_seq") === col("seq_idx"), 1L).otherwise(0L)).as("n_starts"),
        sum("tok_in_seq").as("n_tokens"))
      .orderBy("writer", "seq_idx")
  }

  /** Extends [[shardPackCte]]'s lane/cumsum chain (same writer hash,
   *  same running sum) with the window explode via `range`. */
  val seqPackOracle: String = "WITH " + shardPackCte.trim + """,
s AS (
  SELECT writer, cum_before, n_tok,
         cum_before // 512 AS first_seq,
         (cum_before + n_tok - 1) // 512 AS last_seq
  FROM c),
e AS (
  SELECT writer, cum_before, n_tok, first_seq,
         CAST(unnest(range(first_seq, last_seq + 1)) AS BIGINT) AS seq_idx
  FROM s)
SELECT writer, seq_idx,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN first_seq = seq_idx THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
       CAST(SUM(LEAST(cum_before + n_tok, (seq_idx + 1) * 512)
              - GREATEST(cum_before, seq_idx * 512)) AS BIGINT) AS n_tokens
FROM e
GROUP BY writer, seq_idx
ORDER BY writer, seq_idx"""

  /** Context-length packing-efficiency sweep — the planning table
   *  behind the [[seqPack]] vs pad-per-document layout choice: for
   *  each candidate context length, what the PADDED layout (one doc
   *  per sequence, pad short docs to L, truncate long ones — the SFT
   *  default) wastes in pad/truncated tokens, against what the PACKED
   *  concat-and-chunk layout ([[seqPack]]'s discipline, same 8 writer
   *  lanes) wastes (only each lane's last window is partial). The
   *  utilization gap per L is the direct "tokens paid vs tokens
   *  trained on" cost of keeping document isolation, and the
   *  truncation column says what long-document mass a short L
   *  silently drops — the two numbers that pick a context length
   *  before a run.
   *
   *  All integer: per-doc token counts, LEAST/GREATEST splits, packed
   *  sequence counts as per-lane ceil division `(lane + L - 1) div L`.
   *  Scale shape: one corpus pass partial-aggregated map-side onto the
   *  |grid|-row broadcast cross (4N intermediate rows collapse in the
   *  combiner); the packed side aggregates the 8-row lane frame. */
  def packPaddingSweep(docs: DataFrame,
                       seqLens: Seq[Int] = Seq(128, 256, 512, 1024),
                       writers: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grid = seqLens.map(_.toLong).toDF("seq_len")
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % writers).as("writer"))
    val padded = toks.crossJoin(broadcast(grid))
      .groupBy("seq_len").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tokens"),
        sum(least(col("n_tok"), col("seq_len"))).as("kept_tokens"),
        sum(greatest(lit(0L), col("seq_len") - col("n_tok")))
          .as("padded_pad_tokens"),
        sum(greatest(lit(0L), col("n_tok") - col("seq_len")))
          .as("padded_trunc_tokens"))
    val packed = toks.groupBy("writer").agg(sum("n_tok").as("lane_tokens"))
      .crossJoin(broadcast(grid))
      .groupBy("seq_len").agg(
        sum(expr("(lane_tokens + seq_len - 1) div seq_len")).as("packed_seqs"))
    padded.join(packed, "seq_len")
      .select(col("seq_len"), col("n_docs"), col("total_tokens"),
        col("padded_pad_tokens"), col("padded_trunc_tokens"),
        r4(col("kept_tokens") * lit(1.0) / (col("n_docs") * col("seq_len")))
          .as("padded_util"),
        col("packed_seqs"),
        (col("packed_seqs") * col("seq_len") - col("total_tokens"))
          .as("packed_pad_tokens"),
        r4(col("total_tokens") * lit(1.0)
          / (col("packed_seqs") * col("seq_len"))).as("packed_util"))
      .orderBy("seq_len")
  }

  /** Rides [[shardPackCte]]'s `t` (same writer hash and token count —
   *  one lane definition across the packing family). */
  val packPaddingSweepOracle: String = "WITH " + shardPackCte.trim + """,
grid(seq_len) AS (VALUES (CAST(128 AS BIGINT)), (CAST(256 AS BIGINT)),
                         (CAST(512 AS BIGINT)), (CAST(1024 AS BIGINT))),
padded AS (
  SELECT g.seq_len,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         CAST(SUM(LEAST(n_tok, g.seq_len)) AS BIGINT) AS kept_tokens,
         CAST(SUM(GREATEST(0, g.seq_len - n_tok)) AS BIGINT) AS padded_pad_tokens,
         CAST(SUM(GREATEST(0, n_tok - g.seq_len)) AS BIGINT) AS padded_trunc_tokens
  FROM t CROSS JOIN grid g GROUP BY g.seq_len),
lanes AS (SELECT writer, CAST(SUM(n_tok) AS BIGINT) AS lane_tokens FROM t GROUP BY writer),
pk AS (
  SELECT g.seq_len,
         CAST(SUM((lane_tokens + g.seq_len - 1) // g.seq_len) AS BIGINT) AS packed_seqs
  FROM lanes CROSS JOIN grid g GROUP BY g.seq_len)
SELECT p.seq_len, p.n_docs, p.total_tokens, p.padded_pad_tokens, p.padded_trunc_tokens,
       FLOOR((p.kept_tokens * 1.0 / (p.n_docs * p.seq_len)) * 10000.0 + 0.5) / 10000.0 AS padded_util,
       k.packed_seqs,
       k.packed_seqs * p.seq_len - p.total_tokens AS packed_pad_tokens,
       FLOOR((p.total_tokens * 1.0 / (k.packed_seqs * p.seq_len)) * 10000.0 + 0.5) / 10000.0 AS packed_util
FROM padded p JOIN pk k ON p.seq_len = k.seq_len
ORDER BY p.seq_len"""

  /** Per-source mixture accounting + uniform-mixture resampling
   *  weights — the "data mixing" step of a pre-training pipeline:
   *  what fraction of tokens each source contributes and the weight
   *  that would equalize the mix (`uniform_weight` > 1 = upsample,
   *  < 1 = downsample; multiply by any target share for a non-uniform
   *  recipe). The corpus collapses to ONE K-row frame in the groupBy
   *  (partial agg map-side); the unpartitioned totals window runs on
   *  those K rows only — a single-partition window over source
   *  cardinality, not over the corpus. */
  def sourceMix(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"))
    val all = Window.partitionBy()
    per
      .withColumn("total_tokens", sum("n_tokens").over(all))
      .withColumn("n_sources", count(lit(1)).over(all))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        r4(col("n_tokens") * lit(1.0) / col("total_tokens")).as("token_share"),
        r4(col("total_tokens") * lit(1.0)
          / (col("n_sources") * col("n_tokens"))).as("uniform_weight"))
      .orderBy("source")
  }

  val sourceMixOracle: String = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (
  SELECT source, n_docs, n_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_sources
  FROM per)
SELECT source, n_docs, n_tokens,
       FLOOR((n_tokens * 1.0 / total_tokens) * 10000.0 + 0.5) / 10000.0 AS token_share,
       FLOOR((total_tokens * 1.0 / (n_sources * n_tokens)) * 10000.0 + 0.5) / 10000.0 AS uniform_weight
FROM tot
ORDER BY source"""

  /** Source × language mixture matrix — [[sourceMix]] at the
   *  granularity mixture planning actually happens at (a crawl source
   *  is usually fine in one language and garbage in another, and
   *  per-language token budgets are set against exactly this frame).
   *  Each cell reports its doc/token mass, its share of the corpus,
   *  and its share WITHIN its source (the row-profile that flags a
   *  source whose language mix shifted between snapshots). Same scale
   *  shape as sourceMix: the corpus collapses to cell cardinality in
   *  one map-side-combining aggregation; the share windows run over
   *  that aggregate only (corpus-wide total unpartitioned over K·L
   *  rows, within-source total partitioned by source). */
  def sourceLangMix(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source", "lang").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"))
    per
      .withColumn("total_tokens", sum("n_tokens").over(Window.partitionBy()))
      .withColumn("source_tokens",
        sum("n_tokens").over(Window.partitionBy("source")))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        r4(col("n_tokens") * lit(1.0) / col("total_tokens")).as("token_share"),
        r4(col("n_tokens") * lit(1.0) / col("source_tokens"))
          .as("share_in_source"))
      .orderBy("source", "lang")
  }

  val sourceLangMixOracle: String = """
WITH per AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang),
tot AS (
  SELECT source, lang, n_docs, n_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source) AS BIGINT) AS source_tokens
  FROM per)
SELECT source, lang, n_docs, n_tokens,
       FLOOR((n_tokens * 1.0 / total_tokens) * 10000.0 + 0.5) / 10000.0 AS token_share,
       FLOOR((n_tokens * 1.0 / source_tokens) * 10000.0 + 0.5) / 10000.0 AS share_in_source
FROM tot
ORDER BY source, lang"""

  /** Materialize [[sourceMix]]'s uniform-mixture recipe: emit each doc
   *  `n_copies` times, where n_copies is the source's equalizing
   *  weight split into a whole part (every doc repeats floor(w) times)
   *  and a fractional part applied deterministically (doc's md5 bucket
   *  in [0,10000) < frac(w)*10000 → one extra copy; w < 1 downsamples
   *  the same way, possibly to zero copies). The weight is computed in
   *  1e-4 FIXED POINT with integer division, so every copy count is
   *  engine-exact and append-stable per doc.
   *
   *  Shape at scale: the K-row weight table broadcasts onto a pure
   *  per-row projection; the explode fans out AFTER the filter, so a
   *  downsampled source never materializes dropped rows. No shuffle
   *  beyond the K-row aggregation itself. */
  def mixResample(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("n_tokens"))
    val all = Window.partitionBy()
    val weights = per
      .withColumn("total_tokens", sum("n_tokens").over(all))
      .withColumn("n_sources", count(lit(1)).over(all))
      .select(col("source"),
        expr("(total_tokens * 10000L) div (n_sources * n_tokens)").as("w4"))
    docs.select(col("doc_id"), col("source"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10000L).as("b"))
      .join(broadcast(weights), "source")
      .withColumn("n_copies",
        expr("w4 div 10000") +
          when(col("b") < expr("w4 % 10000"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0) // sequence(0,-1) counts DOWN: filter first
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(0L, n_copies - 1)")).as("copy_idx"),
        col("n_copies"))
      .orderBy("doc_id", "copy_idx")
  }

  val mixResampleOracle: String = """
WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM per),
w AS (
  SELECT source, (total_tokens * 10000) // (n_sources * n_tokens) AS w4
  FROM per, tot),
d AS (
  SELECT doc_id, d.source,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 10000 AS BIGINT) AS b,
         w4
  FROM documents d JOIN w ON d.source = w.source),
c AS (
  SELECT doc_id, source,
         w4 // 10000 + CASE WHEN b < w4 % 10000 THEN 1 ELSE 0 END AS n_copies
  FROM d)
SELECT doc_id, source,
       CAST(unnest(range(0, n_copies)) AS BIGINT) AS copy_idx,
       n_copies
FROM c
ORDER BY doc_id, copy_idx"""

  /** Temperature-based mixture reweighting (the multilingual-corpus
   *  rebalancing rule: sampling probability ∝ share^α flattens the
   *  source distribution — α=1 keeps natural proportions, α→0
   *  approaches uniform; cf. the multilingual-pretraining practice of
   *  α in [0.2, 0.7]). This operator pins **α = 0.5** because
   *  `sqrt` is IEEE-754 correctly rounded in BOTH engines, while a
   *  general `pow(x, α)` is libm-implementation-defined — the same
   *  determinism call [[TextAnalysis.bm25Search]] documents for
   *  `log`. The α=0.5 weight is computed once per source in 1e-6
   *  FIXED POINT (`floor(sqrt(share) * 1e6 + 0.5)` — one double
   *  sqrt + one double division per source, then integers), and the
   *  normalizer is the INTEGER sum of those fixed-point weights, so
   *  every output is exact under any aggregation order. Reports, per
   *  source: natural token share, the fixed-point temperature weight,
   *  the resampled probability, and the boost factor (resampled /
   *  natural — >1 means the source is upsampled).
   *
   *  Scale shape: identical to [[sourceMix]] — one map-side-combining
   *  aggregation to source cardinality; the windows run over the
   *  K-row aggregate only. */
  def mixTemperature(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"))
    val all = Window.partitionBy()
    per
      .withColumn("total_tokens", sum("n_tokens").over(all))
      .withColumn("w6",
        floor(sqrt(col("n_tokens") * lit(1.0) / col("total_tokens"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("w6_sum", sum("w6").over(all))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        r4(col("n_tokens") * lit(1.0) / col("total_tokens")).as("token_share"),
        col("w6").as("temp_weight6"),
        r4(col("w6") * lit(1.0) / col("w6_sum")).as("sample_prob"),
        r4(col("w6") * lit(1.0) * col("total_tokens")
          / (col("w6_sum") * lit(1.0) * col("n_tokens"))).as("boost"))
      .orderBy("source")
  }

  val mixTemperatureOracle: String = """
WITH per AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (
  SELECT source, n_docs, n_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens
  FROM per),
w AS (
  SELECT source, n_docs, n_tokens, total_tokens,
         CAST(FLOOR(sqrt(n_tokens * 1.0 / total_tokens) * 1000000.0 + 0.5) AS BIGINT) AS w6
  FROM tot),
n AS (
  SELECT source, n_docs, n_tokens, total_tokens, w6,
         CAST(SUM(w6) OVER () AS BIGINT) AS w6_sum
  FROM w)
SELECT source, n_docs, n_tokens,
       FLOOR((n_tokens * 1.0 / total_tokens) * 10000.0 + 0.5) / 10000.0 AS token_share,
       w6 AS temp_weight6,
       FLOOR((w6 * 1.0 / w6_sum) * 10000.0 + 0.5) / 10000.0 AS sample_prob,
       FLOOR((w6 * 1.0 * total_tokens / (w6_sum * 1.0 * n_tokens)) * 10000.0 + 0.5) / 10000.0 AS boost
FROM n
ORDER BY source"""

  /** Data-constrained mixture EPOCH ledger (Muennighoff et al. 2023,
   *  arXiv:2305.16264 "Scaling Data-Constrained Language Models" — the
   *  repeat-data regime): [[mixTemperature]] says what FRACTION each
   *  source should contribute; this prices what that recipe costs in
   *  repetition when the training token budget exceeds the corpus.
   *  For each budget multiple `x` (budget = x × corpus tokens) and
   *  source: tokens requested under the α=0.5 temperature weights
   *  (the SAME 1e-6 fixed-point w6 chain — one weight definition
   *  across both operators), epochs over the source's available
   *  tokens, the repeated-token overflow, and the
   *  `epochs > 4` flag — the published point where repeated data's
   *  value decays to ~zero, i.e. the sources that cap the usable
   *  budget under this recipe.
   *
   *  Determinism: the w6 weights are the mixTemperature fixed-point
   *  integers; `tokens_requested` is a FLOOR over one fixed-order
   *  double chain `((x·total)·1.0·w6)/w6_sum` — x·total stays integer
   *  (< 2^63 at any corpus), the double steps are IEEE-identical on
   *  both engines, and every downstream column derives from the
   *  resulting integer. Scale shape: [[sourceMix]]'s — one map-side
   *  aggregation to K rows, windows + the |budgets|-row broadcast grid
   *  over the K-row frame only. */
  def mixEpochs(docs: DataFrame, budgets: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val per = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source").agg(sum("n_tok").as("n_tokens"))
    val all = Window.partitionBy()
    val grid = budgets.map(_.toLong).toDF("budget_x")
    per
      .withColumn("total_tokens", sum("n_tokens").over(all))
      .withColumn("w6",
        floor(sqrt(col("n_tokens") * lit(1.0) / col("total_tokens"))
          * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("w6_sum", sum("w6").over(all))
      .crossJoin(broadcast(grid))
      .withColumn("tokens_requested",
        floor(col("budget_x") * col("total_tokens") * lit(1.0)
          * col("w6") / col("w6_sum")).cast("long"))
      .select(col("budget_x"), col("source"), col("n_tokens"),
        r4(col("w6") * lit(1.0) / col("w6_sum")).as("sample_prob"),
        col("tokens_requested"),
        r4(col("tokens_requested") * lit(1.0) / col("n_tokens")).as("epochs"),
        greatest(lit(0L), col("tokens_requested") - col("n_tokens"))
          .as("repeated_tokens"),
        when(col("tokens_requested") > col("n_tokens") * lit(4L), 1L)
          .otherwise(0L).as("over_four_epochs"))
      .orderBy("budget_x", "source")
  }

  /** Extends [[mixTemperatureOracle]]'s w6 chain with the budget grid;
   *  the requested-token FLOOR mirrors the Spark double chain's
   *  left-to-right association term for term. */
  val mixEpochsOracle: String = """
WITH per AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (
  SELECT source, n_tokens,
         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens
  FROM per),
w AS (
  SELECT source, n_tokens, total_tokens,
         CAST(FLOOR(sqrt(n_tokens * 1.0 / total_tokens) * 1000000.0 + 0.5) AS BIGINT) AS w6
  FROM tot),
n AS (
  SELECT source, n_tokens, total_tokens, w6,
         CAST(SUM(w6) OVER () AS BIGINT) AS w6_sum
  FROM w),
grid(budget_x) AS (VALUES (CAST(1 AS BIGINT)), (CAST(2 AS BIGINT)), (CAST(4 AS BIGINT))),
req AS (
  SELECT g.budget_x, n.source, n.n_tokens, n.w6, n.w6_sum,
         CAST(FLOOR(g.budget_x * n.total_tokens * 1.0 * n.w6 / n.w6_sum) AS BIGINT) AS tokens_requested
  FROM n CROSS JOIN grid g)
SELECT budget_x, source, n_tokens,
       FLOOR((w6 * 1.0 / w6_sum) * 10000.0 + 0.5) / 10000.0 AS sample_prob,
       tokens_requested,
       FLOOR((tokens_requested * 1.0 / n_tokens) * 10000.0 + 0.5) / 10000.0 AS epochs,
       GREATEST(CAST(0 AS BIGINT), tokens_requested - n_tokens) AS repeated_tokens,
       CAST(CASE WHEN tokens_requested > n_tokens * 4 THEN 1 ELSE 0 END AS BIGINT) AS over_four_epochs
FROM req
ORDER BY budget_x, source"""

  /** Stratified curation shortlist: the top-k docs PER LANGUAGE by
   *  quality score (ties broken by doc_id) — the "best docs per
   *  stratum" selection that keeps low-resource languages represented
   *  when a global top-k would drown them. One quality pass + one
   *  window rank per stratum. */
  def curationSample(docs: DataFrame, k: Int = 25): DataFrame = {
    val q = TextAnalysis.qualityScore(docs).select("doc_id", "quality")
    docs.select("doc_id", "lang").join(q, "doc_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("quality").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk").cast("long").as("rank"),
        col("doc_id"), col("quality"))
      .orderBy("lang", "rank")
  }

  /** Mirrors [[TextAnalysis.qualityScoreOracle]]'s quality formula,
   *  then ranks within language. */
  val curationSampleOracle: String = """
WITH q AS (
  SELECT doc_id, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
         CAST(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a')) AS BIGINT) AS stop_tok,
         CAST(len(regexp_extract_all(text, '[.,!?;:]', 0)) AS BIGINT) AS punct
  FROM documents),
scored AS (
  SELECT doc_id,
         FLOOR((0.4 * LEAST(1.0, n_chars / 500.0)
               + 0.4 * (n_distinct * 1.0 / n_tok)
               + 0.2 * (1.0 - stop_tok * 1.0 / n_tok)
               - punct * 1.0 / (CASE WHEN n_chars > 0 THEN n_chars ELSE 1 END)) * 10000.0 + 0.5) / 10000.0 AS quality
  FROM q),
ranked AS (
  SELECT d.lang, s.doc_id, s.quality,
         ROW_NUMBER() OVER (PARTITION BY d.lang
           ORDER BY s.quality DESC, s.doc_id) AS rk
  FROM scored s JOIN documents d ON s.doc_id = d.doc_id)
SELECT lang, CAST(rk AS BIGINT) AS rank, doc_id, quality
FROM ranked WHERE rk <= 25
ORDER BY lang, rank"""
  /** Cluster-aware split assignment — the FIX for what
   *  [[splitLeakage]] measures: the split bucket is computed from the
   *  near-dup CLUSTER id (min doc_id in the connected component;
   *  singletons are their own cluster), so every near-duplicate
   *  family lands wholly in one split and cross-split leakage is zero
   *  BY CONSTRUCTION (asserted in PipelineSpec by composing the two
   *  operators). Same deterministic md5-bucket rule as
   *  [[splitAssign]], applied to `cluster_id` instead of `doc_id`;
   *  the extra cost over a plain split is the near-dup pass + closure
   *  a curation pipeline has already paid (`precomputedPairs`
   *  composes with any detector, same contract as
   *  [[graft.pipeline.Clustering.dedupClusters]]). */
  def clusterSplit(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5,
                   precomputedPairs: Option[DataFrame] = None): DataFrame = {
    val pairs = precomputedPairs.getOrElse(Dedup.dedupNgram(docs))
      .select("doc_a", "doc_b")
    val comp = Clustering.componentsAuto(pairs)
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
      .select(col("doc_id"), col("cluster_id"), bucket100("cluster_id"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
      .select("doc_id", "cluster_id", "bucket", "split")
      .orderBy("doc_id")
  }

  /** Shares [[graft.pipeline.Clustering]]'s recursive-closure CTE
   *  chain and [[splitAssign]]'s bucket spelling. */
  val clusterSplitOracle: String =
    "WITH RECURSIVE " + Dedup.shinglesCte.trim + "," +
      Clustering.closureFromShingles + """,
allc AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
bk AS (
  SELECT doc_id, cluster_id,
         CAST(CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) AS bucket
  FROM allc)
SELECT doc_id, cluster_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM bk
ORDER BY doc_id"""

  /** Split-leakage audit: near-dup pairs that CROSS the deterministic
   *  train/val/test boundary — the eval-integrity hole a random split
   *  always has on a deduped-but-not-clustered corpus (doc-level
   *  splits leak near-duplicate content between train and eval; this
   *  table is the evidence). One row per (own_split, partner_split):
   *  how many docs of `own_split` have at least one near-dup partner
   *  in `partner_split`, and how many pairs cross that edge. The fix
   *  it motivates is cluster-aware splitting (split on
   *  [[graft.pipeline.Clustering]] cluster ids, not doc ids).
   *  Shape: the pair frame is near-dup-sized; two id-keyed joins
   *  against the split projection and one small aggregate — no new
   *  corpus pass beyond dedupNgram's own. The split rule is
   *  [[splitAssign]] verbatim. */
  def splitLeakage(docs: DataFrame, trainPct: Int = 90,
                   valPct: Int = 5): DataFrame = {
    val split = splitAssign(docs, trainPct, valPct)
      .select("doc_id", "split")
    val pairs = Dedup.dedupNgram(docs).select("doc_a", "doc_b")
    val halves = pairs
      .select(col("doc_a").as("doc_id"), col("doc_b").as("partner"))
      .unionByName(pairs
        .select(col("doc_b").as("doc_id"), col("doc_a").as("partner")))
    halves
      .join(split, "doc_id")
      .join(split.select(col("doc_id").as("partner"),
        col("split").as("partner_split")), "partner")
      .filter(col("split") =!= col("partner_split"))
      .groupBy("split", "partner_split")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_pairs"))
      .select(col("split").as("own_split"), col("partner_split"),
        col("n_docs"), col("n_pairs"))
      .orderBy("own_split", "partner_split")
  }

  /** Shares [[Dedup.ngramVerifiedCte]] and [[Sampling.splitAssign]]'s
   *  md5-bucket rule. */
  val splitLeakageOracle: String =
    "WITH " + Dedup.shinglesCte + "," + Dedup.ngramVerifiedCte + """,
sp AS (
  SELECT doc_id,
         CASE WHEN CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) < 90 THEN 'train'
              WHEN CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS BIGINT) < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
halves AS (
  SELECT doc_a AS doc_id, doc_b AS partner FROM verified
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS partner FROM verified),
j AS (
  SELECT h.doc_id, s1.split, s2.split AS partner_split
  FROM halves h
  JOIN sp s1 ON h.doc_id = s1.doc_id
  JOIN sp s2 ON h.partner = s2.doc_id
  WHERE s1.split <> s2.split)
SELECT split AS own_split, partner_split,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM j
GROUP BY split, partner_split
ORDER BY own_split, partner_split"""

}
