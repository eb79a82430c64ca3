package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-derived language-model statistics for training-data curation:
  * unigram log-probability document scoring (the shape of CCNet's
  * KenLM-perplexity filter, arXiv:1911.00359 — docs whose tokens are
  * improbable under a corpus LM are flagged as noise) and pointwise
  * mutual information over adjacent token pairs (Church & Hanks 1990 —
  * the standard collocation statistic).
  *
  * Scale shape (both operators):
  *   - one explode of the tokenized corpus (narrow, no pre-shuffle),
  *   - token/pair counts via hash aggregation (shuffle bounded by
  *     VOCABULARY size, orders of magnitude below corpus size),
  *   - count lookups rejoin on the token — broadcastable while the
  *     vocabulary fits (~10M words ≈ 100 MB), a plain shuffle join on
  *     the already-aggregated tables beyond that,
  *   - corpus totals arrive as broadcast one-row aggregates on a
  *     non-foldable constant key (never a driver-side `.count()`, and
  *     never a BroadcastNestedLoopJoin — see [[CorpusSignals.one]]).
  *
  * Numeric parity with the DuckDB oracle: every count is an exact
  * integer through the shuffle; the only floating-point steps are the
  * final `ln` / division / mean, written identically on both sides and
  * rounded to 6 dp.
  */
object LanguageModel {

  private val toks = Dedup.TokensExpr
  private def one(c: org.apache.spark.sql.Column) = CorpusSignals.one(c)

  // ---- shared input frames -------------------------------------------
  // The whole family consumes these cached frames; SparkEntry builds
  // each once per (session, sf) like doc_shingles. The corpus is
  // tokenized TWICE, once per cached family input: the exploded token
  // stream (unigram consumers) and the bigram pair counts — bigrams
  // need adjacency, which the position-free exploded stream has already
  // discarded, and recovering it there would cost a corpus-wide
  // pair-up shuffle where a second narrow tokenize pass costs none.

  /** `(doc_id, source, token)` — the exploded token stream. */
  def docTokens(docs: DataFrame): DataFrame =
    graft.sources.Tables.fanOut(docs)
      .select(col("doc_id"), col("source"), explode(expr(toks)).as("token"))

  /** `(token, c)` — the corpus vocabulary with counts, derived from
    * [[docTokens]]; cached separately so the three consumers that need
    * it don't each rescan the (corpus-sized) token stream to rebuild an
    * identical table.
    */
  def vocabFrom(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** `(w1, w2, c_xy)` — adjacent-pair counts (observed-bigram-bounded).
    * Docs with < 2 tokens short-circuit (Spark's `sequence(1, 0)`
    * DESCENDS — same guard as CorpusSignals.GramsExpr).
    */
  def bigramCounts(docs: DataFrame): DataFrame =
    graft.sources.Tables.fanOut(docs)
      .withColumn("toks", expr(toks))
      .filter(size(col("toks")) >= 2)
      .select(
        explode(
          expr(
            "transform(sequence(1, size(toks) - 1), " +
              "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_xy"))

  /** Per-document mean negative unigram log-probability (a.k.a. the
    * document's unigram cross-entropy in nats): for each token `t` with
    * corpus count `c(t)` and corpus token total `N`,
    * `score = avg over tokens of ln(N) - ln(c(t))`. Low = fluent under
    * the corpus distribution; high = rare/garbled tokens (CCNet keeps
    * the low-perplexity head and tail-filters the rest).
    *
    * No smoothing term: the vocabulary is learned from the same corpus
    * being scored, so every token has `c(t) >= 1`. A held-out-model
    * variant joins a precomputed `(token, c)` table instead — identical
    * plan, the vocabulary side just arrives from disk.
    *
    * Empty documents contribute no token rows and are absent from the
    * output (consistent with the oracle's inner join).
    */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val tokens = docTokens(docs)
    unigramLogprobFrom(tokens, vocabFrom(tokens))
  }

  /** [[unigramLogprob]] over pre-built (cached) token + vocab frames.
    * The vocab join is UNHINTED: broadcastable while the vocabulary
    * fits, a plain shuffle join on the token beyond that — Spark/AQE
    * picks per run.
    */
  def unigramLogprobFrom(tokens: DataFrame, vocab: DataFrame): DataFrame = {
    val total = vocab
      .agg(sum(col("c")).as("n_total"))
      .withColumn("one", one(col("n_total")))
    tokens
      .join(vocab, "token")
      .withColumn("one", one(col("c")))
      .join(broadcast(total), "one")
      .drop("one")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(
          avg(log(col("n_total").cast("double")) - log(col("c").cast("double"))),
          6).as("avg_neg_logprob"))
      .orderBy(col("doc_id"))
  }

  val UnigramLogprobSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
      |  FROM documents),
      |v AS (SELECT token, count(*) AS c FROM u GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM v)
      |SELECT u.doc_id, count(*) AS n_tokens,
      |       round(avg(ln(CAST(n.n_total AS DOUBLE)) - ln(CAST(v.c AS DOUBLE))), 6)
      |         AS avg_neg_logprob
      |FROM u JOIN v USING (token) CROSS JOIN n
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** How many top collocations [[bigramPmi]] reports. */
  val PmiTopK = 20

  /** Top-k adjacent-token bigrams by corpus count, with their pointwise
    * mutual information `pmi = ln(p(xy) / (p(x)·p(y)))` where
    * `p(xy) = c(xy)/N_bigrams`, `p(x) = c(x)/N_tokens`. High-PMI pairs
    * are collocations (phrases that co-occur far above chance) — the
    * statistic behind phrase-mining a tokenizer's merge candidates.
    *
    * Ranking is by raw pair count (descending, then lexicographic), not
    * by PMI: rare pairs have inflated PMI and ranking by it would
    * surface hapax noise — counts first, PMI as the reported statistic,
    * is the standard presentation.
    *
    * The final top-k is a global `ORDER BY … LIMIT k` — Spark plans it
    * as TakeOrderedAndProject (per-partition top-k, k·partitions rows
    * to the driver), never a global sort.
    */
  def bigramPmi(docs: DataFrame, k: Int = PmiTopK): DataFrame = {
    val tokens = docTokens(docs)
    bigramPmiFrom(vocabFrom(tokens), bigramCounts(docs), k)
  }

  /** [[bigramPmi]] over pre-built (cached) vocab and pair frames. The
    * vocabulary lookup joins are UNHINTED (see [[unigramLogprobFrom]]);
    * only the one-row totals frame is force-broadcast.
    */
  def bigramPmiFrom(vocab: DataFrame, pairCounts: DataFrame, k: Int = PmiTopK): DataFrame = {
    val pairs = pairCounts.withColumnRenamed("c_xy", "n_pair")
    val totals = vocab
      .agg(sum(col("c")).as("n_tok"))
      .withColumn("one", one(col("n_tok")))
      .join(
        pairs.agg(sum(col("n_pair")).as("n_bg")).withColumn("one", one(col("n_bg"))),
        "one")
    val u1 = vocab.select(col("token").as("w1"), col("c").as("c1"))
    val u2 = vocab.select(col("token").as("w2"), col("c").as("c2"))
    pairs
      .join(u1, "w1")
      .join(u2, "w2")
      .withColumn("one", one(col("n_pair")))
      .join(broadcast(totals), "one")
      .withColumn(
        "pmi",
        round(
          log(
            (col("n_pair").cast("double") / col("n_bg").cast("double")) /
              ((col("c1").cast("double") / col("n_tok").cast("double")) *
                (col("c2").cast("double") / col("n_tok").cast("double")))),
          6))
      .select(col("w1"), col("w2"), col("n_pair"), col("pmi"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Interpolated-bigram LM document scoring — the full CCNet
    * perplexity-filter shape (arXiv:1911.00359 filters on a KenLM
    * n-gram model; [[unigramLogprob]] is its unigram degenerate): for
    * each adjacent pair (w1, w2) in a document,
    *
    *   p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/N
    *
    * (Jelinek-Mercer interpolation with the corpus unigram as the
    * back-off — the standard fix for bigram sparsity without held-out
    * tuning), and the score is the document's mean negative log
    * probability (its bigram cross-entropy in nats). Low = fluent word
    * ORDER under the corpus, not just fluent vocabulary — a shuffled
    * bag of common words fools the unigram filter but not this one.
    *
    * Scale shape: one positional tokenize pass for the doc-level
    * bigram stream (adjacency is already discarded in the cached token
    * stream — see the family note above), then three lookup joins
    * whose build sides are vocabulary-/observed-bigram-bounded tables
    * (UNHINTED: broadcastable while they fit, shuffle joins beyond —
    * AQE picks), one broadcast one-row totals frame, one per-doc hash
    * aggregate. Every count is an exact integer through the shuffle;
    * the float expression is written identically in both engines and
    * rounded to 6 dp (the [[unigramLogprobFrom]] discipline).
    *
    * No unseen-bigram smoothing hole: the model is learned from the
    * corpus being scored, so every scored pair has c(w1,w2) ≥ 1.
    * Documents with < 2 tokens contribute no pairs and are absent.
    */
  val InterpLambda = 0.75

  def bigramInterpLogprob(docs: DataFrame): DataFrame =
    bigramInterpLogprobFrom(docs, vocabFrom(docTokens(docs)), bigramCounts(docs))

  def bigramInterpLogprobFrom(
      docs: DataFrame,
      vocab: DataFrame,
      pairCounts: DataFrame): DataFrame = {
    val bg = graft.sources.Tables.fanOut(docs)
      .withColumn("toks", expr(toks))
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        explode(
          expr(
            "transform(sequence(1, size(toks) - 1), " +
              "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val total = vocab
      .agg(sum(col("c")).as("n_total"))
      .withColumn("one", one(col("n_total")))
    val p =
      lit(InterpLambda) * (col("c_xy").cast("double") / col("c1").cast("double")) +
        lit(1.0 - InterpLambda) * (col("c2").cast("double") / col("n_total").cast("double"))
    bg
      .join(pairCounts, Seq("w1", "w2"))
      .join(vocab.select(col("token").as("w1"), col("c").as("c1")), "w1")
      .join(vocab.select(col("token").as("w2"), col("c").as("c2")), "w2")
      .withColumn("one", one(col("c_xy")))
      .join(broadcast(total), "one")
      .drop("one")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(-log(p)), 6).as("avg_neg_logprob_bi"))
      .orderBy(col("doc_id"))
  }

  /** Kneser-Ney bigram LM document scoring — the smoothing that
    * n-gram-LM quality filters actually ship (KenLM's default; Chen &
    * Goodman 1998): absolute discounting with a CONTINUATION-count
    * back-off,
    *
    *   p_KN(w2|w1) = (c(w1,w2) − D)/c(w1·)
    *               + D·N1+(w1,·)/c(w1·) · N1+(·,w2)/N1+(·,·)
    *
    * where c(w1·) is the first-position bigram marginal, N1+(w1,·) the
    * number of distinct continuations of w1, N1+(·,w2) the number of
    * distinct HISTORIES w2 follows, and N1+(·,·) the total observed
    * bigram types. The back-off asks "in how many contexts does w2
    * appear?", not "how often?" — the statistic that keeps
    * high-frequency-but-single-context tokens (the 'Francisco'
    * problem) from inflating unseen-context probability, which the
    * Jelinek-Mercer unigram back-off of [[bigramInterpLogprob]]
    * cannot distinguish. Score = per-doc mean negative log (bigram
    * cross-entropy in nats); ranking differences vs JM concentrate on
    * docs riding frequent-but-bound tokens.
    *
    * No max(c−D, 0) clamp: the model is learned from the corpus being
    * scored, so every scored pair has c(w1,w2) ≥ 1 > D — the clamp
    * branch is structurally dead and writing it would only widen the
    * cross-engine float surface. A held-out-model variant needs the
    * clamp plus unseen-history handling.
    *
    * Scale shape: every model table is derived from the observed-
    * bigram-bounded pair-count table (two hash aggs + one one-row
    * count), then the same doc-level bigram stream + unhinted
    * vocabulary-bounded lookup joins as the JM scorer. All counts are
    * exact integers through every shuffle; the float expression is
    * written identically in both engines and rounded to 6 dp.
    */
  val KnDiscount = 0.75

  def bigramKnLogprob(docs: DataFrame): DataFrame =
    bigramKnLogprobFrom(docs, bigramCounts(docs))

  def bigramKnLogprobFrom(docs: DataFrame, pairCounts: DataFrame): DataFrame = {
    val bg = graft.sources.Tables.fanOut(docs)
      .withColumn("toks", expr(toks))
      .filter(size(col("toks")) >= 2)
      .select(
        col("doc_id"),
        explode(
          expr(
            "transform(sequence(1, size(toks) - 1), " +
              "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    // first-position marginal + continuation fan-out per history w1
    val hist = pairCounts
      .groupBy(col("w1"))
      .agg(sum(col("c_xy")).as("c1x"), count(lit(1)).as("n1p_fwd"))
    // continuation count per predicted word w2 (distinct histories)
    val cont = pairCounts
      .groupBy(col("w2"))
      .agg(count(lit(1)).as("n1p_rev"))
    val types = pairCounts
      .agg(count(lit(1)).as("t_types"))
      .withColumn("one", one(col("t_types")))
    val p =
      (col("c_xy").cast("double") - lit(KnDiscount)) / col("c1x").cast("double") +
        lit(KnDiscount) * col("n1p_fwd").cast("double") / col("c1x").cast("double") *
        (col("n1p_rev").cast("double") / col("t_types").cast("double"))
    bg
      .join(pairCounts, Seq("w1", "w2"))
      .join(hist, "w1")
      .join(cont, "w2")
      .withColumn("one", one(col("c_xy")))
      .join(broadcast(types), "one")
      .drop("one")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(-log(p)), 6).as("avg_neg_logprob_kn"))
      .orderBy(col("doc_id"))
  }

  val BigramKnLogprobSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM d, unnest(range(1, len(toks))) AS r(i)
       |  WHERE len(toks) >= 2),
       |pairs AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
       |hist AS (
       |  SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c1x, count(*) AS n1p_fwd
       |  FROM pairs GROUP BY 1),
       |cont AS (SELECT w2, count(*) AS n1p_rev FROM pairs GROUP BY 1),
       |t AS (SELECT count(*) AS t_types FROM pairs)
       |SELECT bg.doc_id, count(*) AS n_bigrams,
       |       round(avg(-ln(
       |         (CAST(p.c_xy AS DOUBLE) - $KnDiscount) / CAST(h.c1x AS DOUBLE) +
       |         $KnDiscount * CAST(h.n1p_fwd AS DOUBLE) / CAST(h.c1x AS DOUBLE) *
       |         (CAST(c.n1p_rev AS DOUBLE) / CAST(t.t_types AS DOUBLE)))), 6)
       |         AS avg_neg_logprob_kn
       |FROM bg
       |JOIN pairs p ON bg.w1 = p.w1 AND bg.w2 = p.w2
       |JOIN hist h ON bg.w1 = h.w1
       |JOIN cont c ON bg.w2 = c.w2
       |CROSS JOIN t
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val BigramInterpLogprobSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |u AS (SELECT unnest(toks) AS token FROM d),
       |uni AS (SELECT token, count(*) AS c FROM u GROUP BY 1),
       |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni),
       |bg AS (
       |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
       |  FROM d, unnest(range(1, len(toks))) AS r(i)
       |  WHERE len(toks) >= 2),
       |pairs AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2)
       |SELECT bg.doc_id, count(*) AS n_bigrams,
       |       round(avg(-ln(
       |         $InterpLambda * (CAST(p.c_xy AS DOUBLE) / CAST(c1.c AS DOUBLE)) +
       |         ${1.0 - InterpLambda} * (CAST(c2.c AS DOUBLE) / CAST(n.n_total AS DOUBLE)))), 6)
       |         AS avg_neg_logprob_bi
       |FROM bg
       |JOIN pairs p ON bg.w1 = p.w1 AND bg.w2 = p.w2
       |JOIN uni c1 ON bg.w1 = c1.token
       |JOIN uni c2 ON bg.w2 = c2.token
       |CROSS JOIN n
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- DSIR importance weighting (target vs raw LM log-ratio) ---------

  /** The target slice for DSIR scoring: documents from this source
    * define the distribution the selection steers toward. A production
    * caller passes any target predicate; one source is the gate's
    * deterministic stand-in.
    */
  val DsirTargetSource = "src0"

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by the mean per-token log-ratio of a TARGET language
    * model to the RAW corpus model,
    *
    *   w(doc) = avg_t [ log p_tgt(t) − log p_raw(t) ],
    *   p(t)   = (c(t) + 1) / (N + V)     (add-1 over the shared vocab)
    *
    * — positive means the doc looks more like the target slice than
    * like the corpus at large; resampling/selecting by this weight
    * steers a training mix toward the target domain. The published
    * method hashes n-grams into a fixed-width table because exact
    * counts are assumed infeasible; this engine counts exactly, so the
    * unigram LMs are the real vocab tables (the hashed-feature variant
    * of the same trick lives in `classifier_train_hashed`).
    *
    * Scale shape: identical to [[unigramLogprob]] — the token stream
    * joins two VOCABULARY-bounded count tables (BOTH left joins: the
    * +1 smoothing absorbs a miss on either side, so an out-of-vocab
    * token under a frozen streaming model still scores instead of
    * silently dropping from the average; ADVICE r13) plus two one-row
    * broadcast stats, then one per-doc hash agg. All counts are exact
    * integers; the only float is the log expression written
    * identically in both engines, rounded 6 dp after the mean.
    */
  def dsirLogRatio(tokens: DataFrame, vocab: DataFrame): DataFrame =
    dsirLogRatioFrom(tokens, vocab, dsirTargetCounts(tokens))

  /** `(token, c_tgt)` — the target-slice count table (one half of the
    * DSIR model; the raw half is the corpus vocab).
    */
  def dsirTargetCounts(tokens: DataFrame): DataFrame =
    tokens
      .filter(col("source") === lit(DsirTargetSource))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("c_tgt"))

  /** [[dsirLogRatio]] against CALLER-SUPPLIED model tables — the form
    * the streaming deploy freezes: `vocab`/`tgt` are trained once in
    * batch and pinned; `tokens` is whatever slice (a micro-batch) needs
    * scoring. Scoring is doc-local given the model, so stream == batch
    * exactly.
    */
  def dsirLogRatioFrom(tokens: DataFrame, vocab: DataFrame, tgt: DataFrame): DataFrame = {
    val st = vocab
      .agg(sum(col("c")).as("n_raw"), count(lit(1)).as("v"))
      .withColumn("one", one(col("v")))
    val ts = tgt
      .agg(coalesce(sum(col("c_tgt")), lit(0L)).as("n_tgt"))
      .withColumn("one", one(col("n_tgt")))
    val term =
      log((col("c_tgt") + 1).cast("double") / (col("n_tgt") + col("v")).cast("double")) -
        log((col("c_raw") + 1).cast("double") / (col("n_raw") + col("v")).cast("double"))
    tokens
      // LEFT join on both model tables (ADVICE r13): with the FROZEN
      // model of the streaming deploy, an out-of-vocab token in an
      // arriving micro-batch must still count toward n_tokens and the
      // average — the add-1 smoothing (c_raw+1)/(n_raw+v) is already
      // well-defined at c_raw=0, exactly how the target side absorbs
      // misses. An inner join silently dropped OOV tokens (and a doc
      // made entirely of unseen tokens emitted no score row at all).
      .join(vocab.select(col("token"), col("c").as("c_raw")), Seq("token"), "left")
      .na.fill(0L, Seq("c_raw"))
      .join(tgt, Seq("token"), "left")
      .na.fill(0L, Seq("c_tgt"))
      .withColumn("one", one(col("c_raw")))
      .join(broadcast(st), "one")
      .join(broadcast(ts), "one")
      .withColumn("term", term)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), round(avg(col("term")), 6).as("avg_log_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic DSIR selection: the `k` documents with the highest
    * importance weight, tie-broken by doc_id — a total order, so both
    * engines cut the identical set (Spark plans TakeOrderedAndProject,
    * never a global sort of the corpus).
    */
  def dsirSelect(tokens: DataFrame, vocab: DataFrame, k: Int = 50): DataFrame =
    dsirLogRatio(tokens, vocab)
      .orderBy(col("avg_log_ratio").desc, col("doc_id"))
      .limit(k)

  private val DsirScoreCte: String =
    s"""d AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |u AS (SELECT doc_id, source, unnest(toks) AS token FROM d),
       |uni AS (SELECT token, count(*) AS c_raw FROM u GROUP BY 1),
       |tgt AS (SELECT token, count(*) AS c_tgt FROM u
       |        WHERE source = '$DsirTargetSource' GROUP BY 1),
       |st AS (SELECT CAST(sum(c_raw) AS BIGINT) AS n_raw, count(*) AS v FROM uni),
       |ts AS (SELECT CAST(coalesce(sum(c_tgt), 0) AS BIGINT) AS n_tgt FROM tgt),
       |sc AS (
       |  SELECT u.doc_id, count(*) AS n_tokens,
       |         round(avg(
       |           ln(CAST(coalesce(t.c_tgt, 0) + 1 AS DOUBLE) /
       |              CAST(ts.n_tgt + st.v AS DOUBLE)) -
       |           ln(CAST(r.c_raw + 1 AS DOUBLE) /
       |              CAST(st.n_raw + st.v AS DOUBLE))), 6) AS avg_log_ratio
       |  FROM u
       |  JOIN uni r ON u.token = r.token
       |  LEFT JOIN tgt t ON u.token = t.token
       |  CROSS JOIN st CROSS JOIN ts
       |  GROUP BY 1)""".stripMargin

  val DsirLogRatioSql: String =
    s"""WITH $DsirScoreCte
       |SELECT doc_id, n_tokens, avg_log_ratio FROM sc ORDER BY doc_id""".stripMargin

  def dsirSelectSql(k: Int = 50): String =
    s"""WITH $DsirScoreCte
       |SELECT doc_id, n_tokens, avg_log_ratio FROM sc
       |ORDER BY avg_log_ratio DESC, doc_id LIMIT $k""".stripMargin

  // ---- perplexity bucketing (CCNet-style head/middle/tail) ------------

  /** CCNet-style perplexity terciles: rank every scored document by its
    * interpolated-bigram LM score ([[bigramInterpLogprobFrom]]) and
    * split the corpus into three equal-size buckets — head (most
    * fluent), middle, tail — reported as per-bucket document counts,
    * bigram mass and score range. This is the partitioning CCNet
    * (Wenzek et al. 2020) applies before sampling training data
    * predominantly from the head/middle buckets.
    *
    * Scale shape: the naive semantics is ONE global row_number over the
    * corpus — a corpus-sized total sort. The plan instead decomposes
    * the global rank over the bounded 6-dp score grid, exactly like
    * [[Sampling.budgetSelect]]: per-score-group counts (hash agg), a
    * prefix sum over the grid-sized group table (the only global
    * window), then per-score row_numbers lifted by the group prefix.
    * Bucket assignment and the final rollup are integer arithmetic on
    * exact ranks — no float crosses an engine boundary except the
    * already-gated 6-dp scores themselves.
    */
  def perplexityBuckets(
      docs: DataFrame,
      vocab: DataFrame,
      pairCounts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pin the scored frame for the call (ADVICE r13): `s` feeds the
    // grid AND the main scan, and each unshared subtree would re-run
    // the bigram-scoring join (token stream ⋈ pairCounts ⋈ vocab²) from
    // scratch. Three narrow columns ∝ corpus docs, spills to disk,
    // released once the result materializes — the streaming views'
    // pinBatch discipline. Eagerly forced so concurrent downstream
    // stages cannot race to build it twice (the cachedView lesson).
    val s = StoreManifest.pinBatch(
      bigramInterpLogprobFrom(docs, vocab, pairCounts)
        .select(col("doc_id"), col("n_bigrams"), col("avg_neg_logprob_bi").as("score")))
    val grid = s.groupBy(col("score")).agg(count(lit(1)).as("n_g"))
    val pre = grid
      .withColumn(
        "cum_before",
        sum(col("n_g")).over(Window.orderBy(col("score"))) - col("n_g"))
      .select(col("score"), col("cum_before"))
    // corpus total derived from the GRID (sum of per-score counts),
    // not from a third scan of `s` (ADVICE r13) — grid is score-grid
    // sized, the aggregate is free
    val total = grid
      .agg(sum(col("n_g")).as("n"))
      .withColumn("one", one(col("n")))
    // within-score rank = running sum of ones in doc_id order, via the
    // two-level scan (Sampling.scoreGroupRunningSum) — no window
    // partition holds a corpus-scale row count even if one score
    // dominates the corpus
    val out = Sampling
      .scoreGroupRunningSum(
        s.join(pre, "score").withColumn("_one_row", lit(1L)),
        Seq("score"), "_one_row", "rk_in_score")
      .withColumn("rk", col("cum_before") + col("rk_in_score"))
      .drop("_one_row", "rk_in_score")
      .withColumn("one", one(col("rk")))
      .join(broadcast(total), "one")
      .withColumn("bucket", expr("(rk - 1) * 3 DIV n").cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy(col("bucket"))
    // the returned plan still reads the pinned `s`, so the pin is left
    // to the session's LRU (a 3-column per-doc frame) rather than
    // unpersisted here — eagerly releasing it would re-expose the
    // double scoring-join evaluation this pin exists to prevent
    out
  }

  /** DuckDB twin — states the NAIVE one-window semantics (global
    * row_number over (score, doc_id)); the hash gate proves the
    * grid-decomposed plan equals it.
    */
  val PerplexityBucketsSql: String =
    s"""WITH sc AS ($BigramInterpLogprobSql),
       |r AS (
       |  SELECT doc_id, n_bigrams, avg_neg_logprob_bi AS score,
       |         row_number() OVER (ORDER BY avg_neg_logprob_bi, doc_id) AS rk,
       |         count(*) OVER () AS n
       |  FROM sc)
       |SELECT CAST((rk - 1) * 3 // n AS INT) AS bucket,
       |       count(*) AS n_docs,
       |       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       |       min(score) AS min_score, max(score) AS max_score
       |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  def bigramPmiSql(k: Int = PmiTopK): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |u AS (SELECT unnest(toks) AS token FROM d),
       |uni AS (SELECT token, count(*) AS c FROM u GROUP BY 1),
       |bg AS (
       |  SELECT toks[i] AS w1, toks[i + 1] AS w2
       |  FROM d, unnest(range(1, len(toks))) AS r(i)
       |  WHERE len(toks) >= 2),
       |pairs AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2),
       |tot AS (
       |  SELECT CAST((SELECT sum(c) FROM uni) AS BIGINT) AS n_tok,
       |         CAST((SELECT sum(n_pair) FROM pairs) AS BIGINT) AS n_bg)
       |SELECT w1, w2, n_pair,
       |       round(ln((CAST(n_pair AS DOUBLE) / CAST(n_bg AS DOUBLE)) /
       |                ((CAST(c1.c AS DOUBLE) / CAST(n_tok AS DOUBLE)) *
       |                 (CAST(c2.c AS DOUBLE) / CAST(n_tok AS DOUBLE)))), 6) AS pmi
       |FROM pairs
       |JOIN uni c1 ON pairs.w1 = c1.token
       |JOIN uni c2 ON pairs.w2 = c2.token
       |CROSS JOIN tot
       |ORDER BY n_pair DESC, w1, w2 LIMIT $k""".stripMargin

  /** Per-source Jensen-Shannon divergence of the source's token
    * distribution from the whole-corpus distribution — the mixture-skew
    * report: a source whose JS is near ln 2 contributes vocabulary the
    * rest of the corpus doesn't have; near 0, it's redundant with the
    * mixture. The statistic behind re-weighting decisions in
    * multi-source training mixes.
    *
    * Decomposed so the plan never materializes sources × vocabulary:
    * with M = (P_s + P)/2,
    *   JS = ½·Σ_{t∈S} p_s·ln(p_s/m) + ½·Σ_{t∈S} p·ln(p/m)
    *      + ½·ln 2·(1 − Σ_{t∈S} p)
    * — every sum ranges over tokens PRESENT in the source (the absent-
    * token tail of KL(P‖M) collapses to the closed-form ln 2 correction,
    * since m = p/2 there). One token explode, two vocabulary-bounded
    * hash aggs, a token-keyed lookup join, and a sources-sized result.
    */
  def sourceJsDivergence(docs: DataFrame): DataFrame = {
    val tokens = docTokens(docs)
    sourceJsDivergenceFrom(tokens, vocabFrom(tokens))
  }

  /** [[sourceJsDivergence]] over pre-built (cached) token + vocab
    * frames (the shared vocab stands in for the per-query corpus-count
    * re-aggregation; `c` is renamed to the corpus-side `c_t`).
    */
  def sourceJsDivergenceFrom(tokens: DataFrame, vocabFrame: DataFrame): DataFrame = {
    val st = tokens
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_st"))
    val srcTot = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val vocab = vocabFrame.select(col("token"), col("c").as("c_t"))
    val total = vocab
      .agg(sum(col("c_t")).as("n"))
      .withColumn("one", one(col("n")))
    st
      .join(vocab, "token")
      .join(broadcast(srcTot), "source")
      .withColumn("one", one(col("c_st")))
      .join(broadcast(total), "one")
      .drop("one")
      .withColumn("ps", col("c_st").cast("double") / col("n_s").cast("double"))
      .withColumn("p", col("c_t").cast("double") / col("n").cast("double"))
      .withColumn("m", (col("ps") + col("p")) / lit(2.0))
      .groupBy(col("source"), col("n_s"))
      .agg(
        sum(col("ps") * log(col("ps") / col("m"))).as("kl_s"),
        sum(col("p") * log(col("p") / col("m"))).as("kl_p"),
        sum(col("p")).as("p_mass"))
      .select(
        col("source"),
        col("n_s").as("n_tokens"),
        round(
          (col("kl_s") + col("kl_p") + log(lit(2.0)) * (lit(1.0) - col("p_mass"))) / 2.0,
          6).as("js_divergence"))
      .orderBy(col("source"))
  }

  val SourceJsDivergenceSql: String =
    """WITH u AS (
      |  SELECT source,
      |         unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
      |  FROM documents),
      |st AS (SELECT source, token, count(*) AS c_st FROM u GROUP BY 1, 2),
      |s AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
      |v AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
      |n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM v),
      |terms AS (
      |  SELECT st.source, s.n_s,
      |         CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE) AS ps,
      |         CAST(c_t AS DOUBLE) / CAST(n.n AS DOUBLE) AS p
      |  FROM st JOIN v USING (token) JOIN s USING (source) CROSS JOIN n)
      |SELECT source, n_s AS n_tokens,
      |       round((sum(ps * ln(ps / ((ps + p) / 2.0)))
      |              + sum(p * ln(p / ((ps + p) / 2.0)))
      |              + ln(2.0) * (1.0 - sum(p))) / 2.0, 6) AS js_divergence
      |FROM terms GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** One-row corpus information profile from exact integer counts:
    * token total, vocabulary size, unigram entropy
    * `H₁ = ln N − (Σ c·ln c)/N` (nats), bigram total, and conditional
    * bigram entropy `H(next|prev) = (Σ c_xy·ln c_x· − Σ c_xy·ln c_xy)/N_bg`
    * with `c_x·` the first-position marginal. H(next|prev) ≪ H₁ means
    * the corpus is locally predictable (templated/repetitive) — the
    * corpus-level twin of the per-document repetition filters.
    *
    * Every ln argument is an exact integer carried through the shuffles;
    * the plan is the bigram/unigram hash aggs plus ONE-ROW reductions.
    */
  def corpusEntropy(docs: DataFrame): DataFrame =
    corpusEntropyFrom(vocabFrom(docTokens(docs)), bigramCounts(docs))

  /** [[corpusEntropy]] over pre-built (cached) vocab and pair frames. */
  def corpusEntropyFrom(vocab: DataFrame, pairCounts: DataFrame): DataFrame = {
    val uniRow = vocab
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("sclc"))
      .withColumn(
        "unigram_entropy",
        round(
          log(col("n_tokens").cast("double")) - col("sclc") / col("n_tokens").cast("double"),
          6))
      .withColumn("one", one(col("n_tokens")))
    val pairs = pairCounts
    val marg = pairs.groupBy(col("w1")).agg(sum(col("c_xy")).as("c_x"))
    val bgRow = pairs
      .join(marg, "w1")
      .agg(
        sum(col("c_xy")).as("n_bigrams"),
        sum(col("c_xy").cast("double") * log(col("c_x").cast("double"))).as("sxlx"),
        sum(col("c_xy").cast("double") * log(col("c_xy").cast("double"))).as("sxlxy"))
      .withColumn(
        "cond_bigram_entropy",
        round((col("sxlx") - col("sxlxy")) / col("n_bigrams").cast("double"), 6))
      .withColumn("one", one(col("n_bigrams")))
    uniRow
      .join(broadcast(bgRow), "one")
      .select(
        col("n_tokens"), col("vocab_size"), col("unigram_entropy"),
        col("n_bigrams"), col("cond_bigram_entropy"))
  }

  val CorpusEntropySql: String =
    """WITH d AS (
      |  SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |u AS (SELECT unnest(toks) AS token FROM d),
      |uni AS (SELECT token, count(*) AS c FROM u GROUP BY 1),
      |urow AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
      |         count(*) AS vocab_size,
      |         round(ln(CAST(sum(c) AS DOUBLE))
      |               - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
      |                 / CAST(sum(c) AS DOUBLE), 6) AS unigram_entropy
      |  FROM uni),
      |bg AS (
      |  SELECT toks[i] AS w1, toks[i + 1] AS w2
      |  FROM d, unnest(range(1, len(toks))) AS r(i)
      |  WHERE len(toks) >= 2),
      |pairs AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
      |marg AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x FROM pairs GROUP BY 1),
      |brow AS (
      |  SELECT CAST(sum(c_xy) AS BIGINT) AS n_bigrams,
      |         round((sum(CAST(c_xy AS DOUBLE) * ln(CAST(c_x AS DOUBLE)))
      |                - sum(CAST(c_xy AS DOUBLE) * ln(CAST(c_xy AS DOUBLE))))
      |               / CAST(sum(c_xy) AS DOUBLE), 6) AS cond_bigram_entropy
      |  FROM pairs JOIN marg USING (w1))
      |SELECT n_tokens, vocab_size, unigram_entropy, n_bigrams, cond_bigram_entropy
      |FROM urow CROSS JOIN brow""".stripMargin
}
