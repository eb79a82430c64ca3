package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines over the `documents` table:
  * token counting, per-language profiling, quality scoring, document
  * fingerprinting, corpus token frequencies.
  *
  * Everything is built from codegen'd builtins (split/filter/aggregate/
  * regexp_count/window) — no UDFs, so the whole path stays inside
  * whole-stage codegen and scales linearly with one shuffle per groupBy.
  */
object TextAnalysis {

  /** Stop-set for quality scoring (vocabulary-appropriate for the
    * synthetic corpus; swap for a real list in production).
    */
  val StopWords: Seq[String] = Seq("the", "a", "and", "row", "value", "table", "data")

  private val toks = Dedup.TokensExpr

  /** Per-document stats: tokens, chars, punctuation, mean token length. */
  def stats(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(toks))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(col("toks")).as("n_tokens"),
        expr("regexp_count(text, '[.,!?;:]')").as("n_punct"),
        // nullif: empty docs yield NULL, not DIVIDE_BY_ZERO (ANSI mode)
        round(
          expr("aggregate(toks, 0, (a, x) -> a + length(x))").cast("double") /
            expr("nullif(size(toks), 0)"),
          6).as("avg_tok_len"))
      .orderBy(col("doc_id"))

  val StatsSql: String =
    """WITH t AS (
      |  SELECT doc_id, length(text) AS n_chars,
      |         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
      |         len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
      |  FROM documents)
      |SELECT doc_id, n_chars, len(toks) AS n_tokens, n_punct,
      |       round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
      |             / nullif(len(toks), 0), 6) AS avg_tok_len
      |FROM t ORDER BY doc_id""".stripMargin

  /** Corpus profile per language: doc count, mean chars, mean tokens. */
  def langProfile(docs: DataFrame): DataFrame =
    docs
      .withColumn("nt", size(expr(toks)))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 6).as("avg_chars"),
        round(avg(col("nt")), 6).as("avg_tokens"))
      .orderBy(col("lang"))

  val LangProfileSql: String =
    """WITH t AS (
      |  SELECT lang, n_chars,
      |         len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS nt
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars,
      |       round(avg(nt), 6) AS avg_tokens
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Quality score: coverage-scaled non-stopword ratio in [0,1].
    * score = min(n_tokens, 100)/100 · (1 − stopword_ratio).
    */
  def qualityScore(docs: DataFrame): DataFrame =
    qualityScoreUnordered(docs).orderBy(col("doc_id"))

  /** [[qualityScore]] without the presentation sort — a pure stateless
    * projection, legal on a STREAMING DataFrame (append mode, no state
    * store); the streaming entry runs exactly this and sorts the sink.
    */
  def qualityScoreUnordered(docs: DataFrame): DataFrame =
    qualityScored(docs)
      .select(col("doc_id"), col("nt").as("n_tokens"), col("stop_ratio"), col("quality"))

  /** [[qualityScoreUnordered]] with the source column retained — the
    * per-source curation consumers (budget-by-source) need the slice
    * key without a corpus self-join to recover it.
    */
  def qualityScoreBySource(docs: DataFrame): DataFrame =
    qualityScored(docs)
      .select(col("doc_id"), col("source"), col("nt").as("n_tokens"), col("quality"))

  /** The scoring transform with the input columns retained — shared by
    * [[qualityScoreUnordered]] and [[qualityCalibration]].
    */
  private def qualityScored(docs: DataFrame): DataFrame = {
    val stopArr = StopWords.map(w => s"'$w'").mkString("array(", ", ", ")")
    docs
      .withColumn("toks", expr(toks))
      .withColumn("nt", size(col("toks")))
      .withColumn("nstop", size(expr(s"filter(toks, x -> array_contains($stopArr, x))")))
      // nullif: empty docs yield NULL ratios, not DIVIDE_BY_ZERO (ANSI mode)
      .withColumn("ntd", expr("nullif(nt, 0)").cast("double"))
      .withColumn("stop_ratio", round(col("nstop").cast("double") / col("ntd"), 6))
      .withColumn(
        "quality",
        round(
          least(col("nt"), lit(100)).cast("double") / 100.0 *
            (lit(1.0) - col("nstop").cast("double") / col("ntd")),
          6))
  }

  val QualityScoreSql: String = {
    val stopList = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, len(toks) AS nt,
       |         len(list_filter(toks, x -> list_contains($stopList, x))) AS nstop
       |  FROM t)
       |SELECT doc_id, nt AS n_tokens,
       |       round(CAST(nstop AS DOUBLE) / nullif(nt, 0), 6) AS stop_ratio,
       |       round(CAST(least(nt, 100) AS DOUBLE) / 100.0 *
       |             (1.0 - CAST(nstop AS DOUBLE) / nullif(nt, 0)), 6) AS quality
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Per-source percentile calibration of the quality score: a raw
    * score threshold filters sources unevenly (each source has its own
    * score distribution), so curation pipelines filter on the
    * WITHIN-SOURCE percentile instead. `percent_rank` over
    * (source | quality, doc_id) — the doc_id tie-break makes ranks
    * deterministic, and ranking happens on the ROUNDED score so both
    * engines order identically. One shuffle on source; each source's
    * window sorts independently (at 100 TB: the per-source sort is the
    * cost, and sources are the natural partition — no global sort).
    * Empty docs (NULL score) are excluded — they cannot be ranked.
    */
  def qualityCalibration(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality").asc, col("doc_id").asc)
    qualityScored(docs)
      .filter(col("quality").isNotNull)
      .withColumn("pctl", round(percent_rank().over(w), 6))
      .select(col("doc_id"), col("source"), col("quality"), col("pctl"))
      .orderBy(col("doc_id"))
  }

  val QualityCalibrationSql: String = {
    val stopList = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, source, len(toks) AS nt,
       |         len(list_filter(toks, x -> list_contains($stopList, x))) AS nstop
       |  FROM t),
       |q AS (
       |  SELECT doc_id, source,
       |         round(CAST(least(nt, 100) AS DOUBLE) / 100.0 *
       |               (1.0 - CAST(nstop AS DOUBLE) / nullif(nt, 0)), 6) AS quality
       |  FROM s)
       |SELECT doc_id, source, quality,
       |       round(percent_rank() OVER (
       |         PARTITION BY source ORDER BY quality ASC, doc_id ASC), 6) AS pctl
       |FROM q WHERE quality IS NOT NULL ORDER BY doc_id""".stripMargin
  }

  /** Hashed-feature linear classifier SERVING plan — the shape of a
    * fastText-style document-quality model applied at corpus scale:
    * per token, a weight looked up by feature hash; per doc, the weight
    * sum, the normalized score, and the sign label. The weights here are
    * a deterministic hash-derived fixture (odd integers in [-15, 15]
    * keyed by the first hex digit of md5(token)); a trained model ships
    * a broadcast weight table instead — the plan is identical.
    *
    * Scale properties: the whole computation is one NARROW per-row
    * split+fold (higher-order `aggregate`, no explode, no shuffle before
    * the presentation sort), and the per-token weights are INTEGERS, so
    * the sum is exact and order-independent — the score is bit-stable
    * under any partitioning or re-run, unlike a float dot-product fold.
    * The only floating op is one final division per document.
    */
  def classifierScore(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(toks))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        expr(
          """aggregate(toks, CAST(0 AS BIGINT),
            | (acc, t) -> acc + 2 * locate(substring(md5(t), 1, 1), '0123456789abcdef') - 17)"""
            .stripMargin).as("w_sum"))
      .filter(col("n_toks") > 0)
      .withColumn("score", round(col("w_sum") / (col("n_toks") * lit(15)).cast("double"), 6))
      .withColumn("label", (col("w_sum") > 0).cast("int"))
      .orderBy(col("doc_id"))

  /** DuckDB twin — same weights (strpos == locate with args swapped),
    * same integer sum, same single final division.
    */
  val ClassifierScoreSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
      |         CAST(list_sum(list_transform(toks,
      |           x -> 2 * strpos('0123456789abcdef', substr(md5(x), 1, 1)) - 17)) AS BIGINT) AS w_sum
      |  FROM t WHERE len(toks) > 0)
      |SELECT doc_id, n_toks, w_sum,
      |       round(w_sum / CAST(n_toks * 15 AS DOUBLE), 6) AS score,
      |       CASE WHEN w_sum > 0 THEN 1 ELSE 0 END AS label
      |FROM s ORDER BY doc_id""".stripMargin

  /** Document fingerprint: min-md5 over tokens (1-permutation MinHash —
    * a compact content signature; grouping by it clusters heavily
    * overlapping docs).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    // the per-token md5 fold is the whole cost and sits before any
    // exchange — fan out the one-file test scan (no-op on real corpora)
    graft.sources.Tables.fanOut(docs)
      .withColumn("toks", expr(toks))
      .select(col("doc_id"), expr("array_min(transform(toks, x -> md5(x)))").as("fp"))
      .orderBy(col("doc_id"))

  val FingerprintSql: String =
    """SELECT doc_id,
      |       list_aggregate(list_transform(
      |         list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
      |         x -> md5(x)), 'min') AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Top-k corpus tokens with deterministic rank (count desc, token asc).
    *
    * The k-selection is `orderBy(...).limit(k)` — physically
    * TakeOrderedAndProject: each partition keeps its local top k and the
    * driver merges k·numPartitions rows. A global `row_number()` window
    * here would pull the ENTIRE vocabulary (billions of distinct tokens
    * at 100 TB) into one partition. Rank over the k survivors is then a
    * single-row aggregate: sort_array over struct(-cnt, token) gives the
    * (cnt desc, token asc) order and posexplode numbers it — no window
    * at all, so no single-partition WindowExec even degenerately.
    */
  def tokenTopK(docs: DataFrame, k: Int): DataFrame =
    docs
      .select(explode(expr(toks)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
      .agg(sort_array(collect_list(struct((-col("cnt")).as("neg"), col("token"), col("cnt")))).as("t"))
      .select(posexplode(col("t")).as(Seq("pos", "r")))
      .select((col("pos") + 1).as("rank"), col("r.token").as("token"), col("r.cnt").as("cnt"))
      .orderBy(col("rank"))

  def tokenTopKSql(k: Int): String =
    s"""WITH u AS (
       |  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS token
       |  FROM documents),
       |c AS (SELECT token, count(*) AS cnt FROM u GROUP BY 1),
       |r AS (SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c)
       |SELECT rank, token, cnt FROM r WHERE rank <= $k ORDER BY rank""".stripMargin

  // ---- sequence-length histogram (packing diagnostic) -----------------

  /** Histogram bin width in tokens. */
  val LengthBinTokens = 64

  /** Token-length histogram in fixed [[LengthBinTokens]]-wide bins —
    * the pre-packing diagnostic: the bin profile decides the packing
    * context length and predicts the padding waste (`sum_tokens` per
    * bin vs bin capacity). Narrow per-row tokenize + one tiny hash agg.
    */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs
      .withColumn("nt", size(expr(toks)))
      .withColumn("bin", expr(s"nt div $LengthBinTokens"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("sum_tokens"),
        min(col("nt")).as("min_tokens"),
        max(col("nt")).as("max_tokens"))
      .orderBy(col("bin"))

  val LengthHistogramSql: String =
    s"""WITH t AS (
       |  SELECT len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt
       |  FROM documents)
       |SELECT nt // $LengthBinTokens AS bin, count(*) AS n_docs,
       |       CAST(sum(nt) AS BIGINT) AS sum_tokens,
       |       min(nt) AS min_tokens, max(nt) AS max_tokens
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- Gopher-style rule filters (arXiv:2112.11446 §A1.1) -------------

  /** Gopher rule thresholds (word-count window relaxed to the synthetic
    * corpus's short documents; the published [50, 100000] is a config
    * swap — the plan is threshold-independent).
    */
  val GopherMinWords = 20
  val GopherMaxWords = 100000
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinAlphaRatio = 0.8
  val GopherMinStopwords = 2

  /** Per-document evaluation of the Gopher quality rules — the
    * rule-based pre-filter that runs BEFORE any model-based scoring in
    * a Gopher/MassiveText-style pipeline:
    *
    *   - `r_words`  word count within [[GopherMinWords]]..[[GopherMaxWords]]
    *   - `r_len`    mean word length within [3, 10]
    *   - `r_sym`    symbol-to-word ratio ('#' or '...') ≤ 0.1
    *   - `r_alpha`  ≥ 80% of words contain an alphabetic character
    *   - `r_stop`   ≥ 2 DISTINCT stop words present
    *   - `pass`     conjunction of all five
    *
    * Flags are INTs (0/1), not booleans, so the driver's hash compare
    * sees identical physical values from both engines. Every metric is
    * integer counting + one exact IEEE division — bit-stable under any
    * partitioning. The whole operator is a narrow per-row projection
    * (no shuffle before the presentation sort): at 100 TB it pipelines
    * inside one WholeStageCodegen over the scan.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val stopArr = StopWords.map(w => s"'$w'").mkString("array(", ", ", ")")
    docs
      .withColumn("toks", expr(toks))
      .withColumn("n_words", size(col("toks")))
      .withColumn("nd", expr("nullif(n_words, 0)").cast("double"))
      .withColumn(
        "mean_w_len",
        round(expr("aggregate(toks, 0, (a, x) -> a + length(x))").cast("double") / col("nd"), 6))
      .withColumn(
        "symbol_ratio",
        round(expr("regexp_count(text, '#|\\\\.\\\\.\\\\.')").cast("double") / col("nd"), 6))
      .withColumn(
        "alpha_ratio",
        round(
          expr("size(filter(toks, x -> x rlike '[A-Za-z]'))").cast("double") / col("nd"),
          6))
      .withColumn(
        "n_stop",
        size(expr(s"array_distinct(filter(toks, x -> array_contains($stopArr, x)))")))
      .withColumn(
        "r_words",
        (col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords).cast("int"))
      .withColumn(
        "r_len",
        (col("mean_w_len") >= GopherMinMeanLen && col("mean_w_len") <= GopherMaxMeanLen)
          .cast("int"))
      .withColumn("r_sym", (col("symbol_ratio") <= GopherMaxSymbolRatio).cast("int"))
      .withColumn("r_alpha", (col("alpha_ratio") >= GopherMinAlphaRatio).cast("int"))
      .withColumn("r_stop", (col("n_stop") >= GopherMinStopwords).cast("int"))
      .withColumn(
        "pass",
        (col("r_words") === 1 && col("r_len") === 1 && col("r_sym") === 1 &&
          col("r_alpha") === 1 && col("r_stop") === 1).cast("int"))
      .select(
        col("doc_id"), col("n_words"), col("mean_w_len"), col("symbol_ratio"),
        col("alpha_ratio"), col("n_stop"), col("r_words"), col("r_len"), col("r_sym"),
        col("r_alpha"), col("r_stop"), col("pass"))
      .orderBy(col("doc_id"))
  }

  val GopherRulesSql: String = {
    val stopList = StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, len(toks) AS n_words,
       |         round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |               / CAST(nullif(len(toks), 0) AS DOUBLE), 6) AS mean_w_len,
       |         round(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
       |               / CAST(nullif(len(toks), 0) AS DOUBLE), 6) AS symbol_ratio,
       |         round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
       |               / CAST(nullif(len(toks), 0) AS DOUBLE), 6) AS alpha_ratio,
       |         len(list_distinct(list_filter(toks, x -> list_contains($stopList, x)))) AS n_stop
       |  FROM t)
       |SELECT doc_id, n_words, mean_w_len, symbol_ratio, alpha_ratio, n_stop,
       |       CAST(n_words >= $GopherMinWords AND n_words <= $GopherMaxWords AS INT) AS r_words,
       |       CAST(mean_w_len >= $GopherMinMeanLen AND mean_w_len <= $GopherMaxMeanLen AS INT) AS r_len,
       |       CAST(symbol_ratio <= $GopherMaxSymbolRatio AS INT) AS r_sym,
       |       CAST(alpha_ratio >= $GopherMinAlphaRatio AS INT) AS r_alpha,
       |       CAST(n_stop >= $GopherMinStopwords AS INT) AS r_stop,
       |       CAST(n_words >= $GopherMinWords AND n_words <= $GopherMaxWords
       |            AND mean_w_len >= $GopherMinMeanLen AND mean_w_len <= $GopherMaxMeanLen
       |            AND symbol_ratio <= $GopherMaxSymbolRatio
       |            AND alpha_ratio >= $GopherMinAlphaRatio
       |            AND n_stop >= $GopherMinStopwords AS INT) AS pass
       |FROM m ORDER BY doc_id""".stripMargin
  }
}
