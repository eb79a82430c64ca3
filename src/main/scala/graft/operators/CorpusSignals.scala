package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level quality signals for training-data curation, beyond the
  * per-document stats in [[TextAnalysis]]:
  *
  *   - repetition metrics (the Gopher/C4-style filters: distinct-token
  *     ratio, top-token mass, duplicate-bigram fraction) used to drop
  *     low-quality boilerplate/spam documents before training;
  *   - TF-IDF top terms per document (the classic relevance weighting
  *     over the inverted-index shape);
  *   - sketch certification: approximate distinct counts (HLL++) and
  *     approximate percentiles checked against their exact values, so
  *     the driver gate certifies the approximation error bound that the
  *     100 TB path relies on.
  *
  * All builtins, no UDFs. Every aggregation is partial+final (map-side
  * combine); the only wide operations are hash aggregations keyed by
  * (doc_id, term) / (token) and one per-doc window for ranking — no
  * joins on high-cardinality keys except token df lookup, which
  * broadcast-joins a vocabulary-sized frame at test scale and falls back
  * to a shuffle join at corpus scale (both correct; Spark picks by
  * stats).
  */
object CorpusSignals {

  private val toks = Dedup.TokensExpr

  /** A constant-1 int that Catalyst cannot constant-fold (it references
    * `c`, and no rule rewrites pmod-by-one), for equi-joining a one-row
    * aggregate without the join degenerating into a nested loop. A
    * same-branch `when` does NOT work — SimplifyConditionals folds it —
    * and a plain lit(1)=lit(1) key folds to a condition-less join, which
    * Spark then plans as a BroadcastNestedLoopJoin.
    */
  private[operators] def one(c: org.apache.spark.sql.Column) =
    (coalesce(pmod(c.cast("long"), lit(1L)), lit(0L)) + lit(1L)).cast("int")

  /** Word bigrams of `toks` — guarded: Spark's `sequence(2, n)` DESCENDS
    * when n < 2, so short docs must short-circuit to an empty array.
    */
  private val GramsExpr =
    "CASE WHEN size(toks) >= 2 THEN transform(sequence(2, size(toks)), i -> concat(toks[i-2], ' ', toks[i-1])) ELSE array() END"

  /** Per-document repetition metrics (Gopher-style quality filters):
    *
    *   - `distinct_ratio`   distinct tokens / total tokens (low ⇒ spam)
    *   - `top_token_ratio`  most frequent token's mass (high ⇒ boilerplate)
    *   - `dup_2gram_ratio`  1 − distinct bigrams / total bigrams
    *                        (NULL for docs with < 2 tokens)
    *
    * Plan shape: ONE explode of tagged (kind, term) rows → hash agg on
    * (doc_id, kind, term) → hash agg on doc_id with FILTERed aggregates.
    * No self-join on doc_id: both token and bigram statistics ride the
    * same shuffle. The shuffle carries terms, not documents — at 100 TB
    * the bytes are bounded by token count, and map-side combine collapses
    * each document's repeats before the exchange (repetitive docs — the
    * ones this filter targets — compress the MOST).
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val terms = graft.sources.Tables.fanOut(docs)
      .withColumn("toks", expr(toks))
      .withColumn("grams", expr(GramsExpr))
      .select(
        col("doc_id"),
        explode(concat(
          expr("transform(toks, x -> named_struct('kind', 't', 'term', x))"),
          expr("transform(grams, g -> named_struct('kind', 'g', 'term', g))"))).as("tt"))
      .select(col("doc_id"), col("tt.kind").as("kind"), col("tt.term").as("term"))
    val counted = terms
      .groupBy(col("doc_id"), col("kind"), col("term"))
      .agg(count(lit(1)).as("c"))
    counted
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("kind") === "t", col("c"))).as("n_tokens"),
        count(when(col("kind") === "t", lit(1))).as("n_distinct"),
        max(when(col("kind") === "t", col("c"))).as("top_c"),
        sum(when(col("kind") === "g", col("c"))).as("n_grams"),
        count(when(col("kind") === "g", lit(1))).as("n_distinct_grams"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("n_distinct").cast("double") / expr("nullif(n_tokens, 0)"), 6)
          .as("distinct_ratio"),
        round(col("top_c").cast("double") / expr("nullif(n_tokens, 0)"), 6)
          .as("top_token_ratio"),
        round(lit(1.0) - col("n_distinct_grams").cast("double") / expr("nullif(n_grams, 0)"), 6)
          .as("dup_2gram_ratio"))
      .orderBy(col("doc_id"))
  }

  val RepetitionStatsSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |terms AS (
      |  SELECT doc_id, 't' AS kind, unnest(toks) AS term FROM d
      |  UNION ALL
      |  SELECT doc_id, 'g' AS kind,
      |         unnest(list_transform(range(2, len(toks) + 1), i -> toks[i-1] || ' ' || toks[i])) AS term
      |  FROM d),
      |counted AS (
      |  SELECT doc_id, kind, term, count(*) AS c FROM terms GROUP BY 1, 2, 3),
      |agg AS (
      |  SELECT doc_id,
      |         CAST(sum(c) FILTER (kind = 't') AS BIGINT) AS n_tokens,
      |         count(*) FILTER (kind = 't') AS n_distinct,
      |         max(c) FILTER (kind = 't') AS top_c,
      |         CAST(sum(c) FILTER (kind = 'g') AS BIGINT) AS n_grams,
      |         count(*) FILTER (kind = 'g') AS n_distinct_grams
      |  FROM counted GROUP BY 1)
      |SELECT doc_id, n_tokens,
      |       round(CAST(n_distinct AS DOUBLE) / nullif(n_tokens, 0), 6) AS distinct_ratio,
      |       round(CAST(top_c AS DOUBLE) / nullif(n_tokens, 0), 6) AS top_token_ratio,
      |       round(1.0 - CAST(n_distinct_grams AS DOUBLE) / nullif(n_grams, 0), 6) AS dup_2gram_ratio
      |FROM agg ORDER BY doc_id""".stripMargin

  /** Number of top TF-IDF terms reported per document. */
  val TfidfTopK = 3

  /** Top-k TF-IDF terms per document with smoothed IDF
    * `ln((N+1)/(df+1)) + 1` (the standard sklearn-style smoothing: no
    * zero or negative weights, no div-by-zero on unseen terms).
    *
    * Plan shape: term counts (one explode + hash agg) feed BOTH the tf
    * side and the df side; `N` arrives as a broadcast one-row aggregate
    * (never a driver-side `.count()` — the plan stays lazy and whole).
    * The df lookup joins on `token`: vocabulary-sized, broadcast at test
    * scale; at 100 TB it becomes a shuffle join on the token — still the
    * right shape, since both sides are already aggregated (bytes =
    * vocabulary + per-doc distinct terms, never raw text). The final
    * per-doc top-k is a window over (doc_id) — each partition holds one
    * document's distinct terms, bounded by document length.
    *
    * Ties break on token ascending, so output is deterministic.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = TfidfTopK): DataFrame = {
    val fan = graft.sources.Tables.fanOut(docs)
    val tf = fan
      .select(col("doc_id"), explode(expr(toks)).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // one-row corpus size: equi-join on a constant-1 key so the plan is
    // a BroadcastHashJoin, not a nested-loop (PlanAuditSpec kill
    // criterion). The key must be NON-FOLDABLE (derived from a column) —
    // a lit(1)=lit(1) condition constant-folds away and Catalyst then
    // plans the join as a BroadcastNestedLoopJoin again.
    val n = fan.agg(count(lit(1)).as("n_docs")).withColumn("one", one(col("n_docs")))
    val scored = tf
      .join(df, "token")
      .withColumn("one", one(col("tf")))
      .join(broadcast(n), "one")
      .drop("one")
      .withColumn(
        "tfidf",
        col("tf").cast("double") *
          (log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1)).cast("double")) + lit(1.0)))
    scored
      .withColumn(
        "rnk",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("token"), round(col("tfidf"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  def tfidfTopTermsSql(k: Int = TfidfTopK): String =
    s"""WITH u AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS token
       |  FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM u GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.token,
       |         CAST(tf.tf AS DOUBLE) *
       |           (ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE)) + 1.0) AS tfidf
       |  FROM tf JOIN df USING (token) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, token, tfidf,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
       |  FROM scored)
       |SELECT doc_id, rnk, token, round(tfidf, 6) AS tfidf
       |FROM ranked WHERE rnk <= $k ORDER BY doc_id, rnk""".stripMargin

  /** Relative error the sketches must stay within for the gate to pass. */
  val SketchTolerance = 0.05

  /** Certify the approximate sketches against exact answers, per
    * event_type over `events`:
    *
    *   - `exact_users`  exact distinct user_id (the oracle recomputes it)
    *   - `users_ok`     HLL++ (`approx_count_distinct`, rsd 0.01) within
    *                    [[SketchTolerance]] of exact
    *   - `p50`          exact interpolated median of `value`
    *   - `p50_ok`       `approx_percentile` (accuracy 10⁴) within
    *                    [[SketchTolerance]] relative of exact
    *
    * The oracle emits the exact values plus literal TRUE for both `ok`
    * columns — so the driver's hash gate FAILS if either sketch drifts
    * outside its bound. This is the check that matters at 100 TB, where
    * exact distinct-count shuffles every key and the sketch path (fixed
    * 16 KB state per group, partial-mergeable) is the only affordable
    * plan; certifying its error on the same gate as everything else
    * keeps "approximate" an engineering bound instead of a hope.
    */
  def sketchCertify(events: DataFrame): DataFrame = {
    // two separate aggregations joined on the (tiny) group key: mixing
    // count_distinct with percentile in ONE agg forces the distinct
    // Expand rewrite under every other aggregate too (measured 17 s vs
    // ~1 s split at sf0.1 — the Expand multiplies input rows and drags
    // the sort-based percentile buffers through it)
    val users = events
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
    val pcts = events
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50_exact"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50_approx"))
    // null-safe equality: a NULL event_type group exists on BOTH sides
    // and must be certified too — a plain inner equi-join would silently
    // drop it (NULL never equals NULL) while the single-query oracle
    // keeps it
    users
      .join(broadcast(pcts), users("event_type") <=> pcts("event_type"))
      .drop(pcts("event_type"))
      .select(
        col("event_type"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          lit(SketchTolerance) * col("exact_users").cast("double")).as("users_ok"),
        round(col("p50_exact"), 6).as("p50"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          lit(SketchTolerance) * abs(col("p50_exact")) + lit(1e-9)).as("p50_ok"))
      .orderBy(col("event_type"))
  }

  val SketchCertifySql: String =
    """SELECT event_type,
      |       count(DISTINCT user_id) AS exact_users,
      |       TRUE AS users_ok,
      |       round(quantile_cont(value, 0.5), 6) AS p50,
      |       TRUE AS p50_ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-source corpus report card — the slice-level summary a mixture
    * planner reads before weighting sources: document/language counts,
    * exact-duplicate incidence, token volume, and mean quality. One row
    * per `source`.
    *
    *   - `n_dup_docs`  documents whose full text also occurs in ANOTHER
    *     document anywhere in the corpus (cross-source too — a mirror
    *     site inflates BOTH its sources' dup counts, which is the signal
    *     wanted). Same min≠max-over-digest-window trick as [[SpanDedup]]:
    *     one shuffle of (digest, doc) rows, no groupBy + join-back.
    *   - `mean_q_permille`  the [[TextAnalysis.qualityScore]] formula in
    *     INTEGER per-mille: q = least(nt,100)·10·(nt − nstop) DIV nt,
    *     averaged as ΣQ DIV n_docs. All-BIGINT arithmetic, so both
    *     engines agree exactly — averaging rounded doubles would leave
    *     the oracle hostage to summation order at scale. Empty docs
    *     contribute 0 (their q is NULL; the sum skips it, the
    *     denominator keeps them — an all-empty source scores 0, not
    *     NULL).
    *
    * Plan shape: one window over md5(text) (digest-width shuffle), then
    * narrow per-doc token counts, then one hash agg keyed by `source` —
    * group count = number of sources, trivially small at any scale.
    */
  def sourceReport(docs: DataFrame): DataFrame = {
    val stopArr = TextAnalysis.StopWords.map(w => s"'$w'").mkString("array(", ", ", ")")
    graft.sources.Tables.fanOut(docs)
      .withColumn("dup", count(lit(1)).over(Window.partitionBy(md5(col("text")))) > 1)
      .withColumn("toks", expr(toks))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("nstop", size(expr(s"filter(toks, x -> array_contains($stopArr, x))")).cast("long"))
      .withColumn(
        "q_permille",
        expr("least(nt, 100L) * 10L * (nt - nstop) div nullif(nt, 0L)"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        count(when(col("dup"), 1)).as("n_dup_docs"),
        sum(col("nt")).as("n_words"),
        coalesce(sum(col("q_permille")), lit(0L)).as("sum_q"))
      .withColumn("mean_q_permille", expr("sum_q div n_docs"))
      .select(
        col("source"), col("n_docs"), col("n_langs"), col("n_dup_docs"),
        col("n_words"), col("mean_q_permille"))
      .orderBy(col("source"))
  }

  val SourceReportSql: String = {
    val stopList = TextAnalysis.StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, lang, source,
       |         count(*) OVER (PARTITION BY md5(text)) > 1 AS dup,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, lang, source, dup,
       |         CAST(len(toks) AS BIGINT) AS nt,
       |         CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS BIGINT) AS nstop
       |  FROM d)
       |SELECT source,
       |       count(*) AS n_docs,
       |       count(DISTINCT lang) AS n_langs,
       |       count(*) FILTER (WHERE dup) AS n_dup_docs,
       |       CAST(sum(nt) AS BIGINT) AS n_words,
       |       coalesce(CAST(sum(least(nt, 100) * 10 * (nt - nstop) // nullif(nt, 0)) AS BIGINT), 0)
       |         // count(*) AS mean_q_permille
       |FROM q GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Lang × source chi-square contingency audit: per-cell observed vs
    * expected-under-independence counts and the χ² contribution — the
    * mixture-drift detector ("did source X stop delivering language
    * Y?") run over the aggregated contingency TABLE, not the corpus:
    * one corpus-sized groupBy produces |langs|×|sources| cells, and the
    * marginal/total windows run over that provably-tiny frame (the
    * global window is over cells, never rows — safe at any corpus
    * size). Both engines compute expected = rowΣ·colΣ/N with identical
    * double association.
    */
  def langSourceChi2(docs: DataFrame): DataFrame = {
    val cells = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("obs"))
    val ex =
      sum(col("obs")).over(Window.partitionBy(col("lang"))).cast("double") *
        sum(col("obs")).over(Window.partitionBy(col("source"))) /
        sum(col("obs")).over(Window.partitionBy())
    cells
      .withColumn("ex", ex)
      .withColumn("d", col("obs").cast("double") - col("ex"))
      .select(
        col("lang"),
        col("source"),
        col("obs"),
        round(col("ex"), 6).as("expected"),
        round(col("d") * col("d") / col("ex"), 6).as("contrib"))
      .orderBy(col("lang"), col("source"))
  }

  val LangSourceChi2Sql: String =
    """WITH c AS (SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
      |e AS (
      |  SELECT lang, source, obs,
      |         CAST(sum(obs) OVER (PARTITION BY lang) AS DOUBLE) *
      |           sum(obs) OVER (PARTITION BY source) /
      |           sum(obs) OVER () AS ex
      |  FROM c)
      |SELECT lang, source, obs, round(ex, 6) AS expected,
      |       round((CAST(obs AS DOUBLE) - ex) * (CAST(obs AS DOUBLE) - ex) / ex, 6) AS contrib
      |FROM e ORDER BY 1, 2""".stripMargin

  // ---- Count-Min heavy hitters --------------------------------------

  /** Count-Min sketch geometry: [[CmDepth]] independent hash rows of
    * [[CmWidth]] counters — 4×1024 longs of TOTAL state regardless of
    * vocabulary size, built by one partial+final hash aggregation over
    * the token stream. At 100 TB the exact `token_top20` pays a
    * vocabulary-wide shuffle; the sketch's map-side combine emits at
    * most d·w rows per partition, which is the only affordable
    * frequency plan when the vocabulary itself doesn't fit — same
    * argument as [[sketchCertify]]'s HLL++/percentile certificates.
    */
  val CmDepth = 4
  val CmWidth = 1024

  /** Row-`i` counter index of a token: the first 8 md5 hex digits of
    * `"cm<i>|" || token`, mod [[CmWidth]] — md5 so DuckDB (and the
    * in-test plain-Scala reference) replay the arithmetic bit-exactly;
    * a production twin would ride xxhash64 like the dedup family.
    */
  private def cmBucket(i: Int, token: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"cm$i|"), token)), 1, 8), 16, 10)
      .cast("long") % CmWidth

  /** Certify Count-Min estimates against the exact top-k counts:
    * `(token, exact_cnt, cm_est, never_under)`.
    *
    * Both the estimate AND the exact count ride the gate hash — the
    * oracle recomputes the full sketch from raw text, so there is no
    * probabilistic tolerance anywhere; `never_under` additionally
    * pins the deterministic Count-Min theorem (an estimate can only
    * overcount). The exact side is the certificate's cost, paid to
    * measure the sketch — the production query reads the d·w counters
    * alone.
    */
  def heavyHittersCm(docs: DataFrame, k: Int = 20): DataFrame =
    cmCertifyAgainst(cmCounters(docs), docs, k)

  private def cmRows(frame: DataFrame) = frame.select(
    frame.columns.map(col) :+
      posexplode(array((0 until CmDepth).map(i => cmBucket(i, col("token"))): _*))
        .as(Seq("i", "bucket")): _*)

  private def tokenStream(docs: DataFrame) =
    graft.sources.Tables.fanOut(docs)
      .select(explode(expr(Dedup.TokensExpr)).as("token"))

  /** The sketch itself: `(i, bucket, c)` — at most [[CmDepth]]·
    * [[CmWidth]] rows after the final merge. PARTIAL counter frames are
    * additive (sum-merge), which is what lets the streaming path keep
    * an append-only log of per-batch partials and serve with one
    * fixed-size aggregation.
    */
  def cmCounters(docs: DataFrame): DataFrame =
    cmRows(tokenStream(docs))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Certify ARBITRARY counter partials (merged here by sum) against
    * the exact top-k of `docs` — shared by the batch entry and the
    * stream-built counter store, which must be indistinguishable.
    */
  def cmCertifyAgainst(counterPartials: DataFrame, docs: DataFrame, k: Int = 20): DataFrame = {
    val counters = counterPartials
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("c"))
    val exact = tokenStream(docs)
      .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token"))
      .limit(k)
    cmRows(exact)
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(col("token"), col("exact_cnt"))
      .agg(min(col("c")).as("cm_est"))
      .select(
        col("token"),
        col("exact_cnt"),
        col("cm_est"),
        (col("cm_est") >= col("exact_cnt")).as("never_under"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  def heavyHittersCmSql(k: Int = 20): String =
    s"""WITH tok AS (
       |  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS token
       |  FROM documents),
       |rows_i AS (SELECT unnest([${(0 until CmDepth).mkString(", ")}]) AS i),
       |buck AS (
       |  SELECT token, i,
       |         CAST(('0x' || substr(md5('cm' || i || '|' || token), 1, 8)) AS BIGINT) % $CmWidth AS bucket
       |  FROM tok CROSS JOIN rows_i),
       |counters AS (SELECT i, bucket, count(*) AS c FROM buck GROUP BY 1, 2),
       |exact AS (
       |  SELECT token, count(*) AS exact_cnt FROM tok GROUP BY 1
       |  ORDER BY exact_cnt DESC, token LIMIT $k),
       |est AS (
       |  SELECT e.token, e.exact_cnt, min(c.c) AS cm_est
       |  FROM exact e CROSS JOIN rows_i t
       |  JOIN counters c
       |    ON c.i = t.i
       |   AND c.bucket = CAST(('0x' || substr(md5('cm' || t.i || '|' || e.token), 1, 8)) AS BIGINT) % $CmWidth
       |  GROUP BY 1, 2)
       |SELECT token, exact_cnt, cm_est, cm_est >= exact_cnt AS never_under
       |FROM est ORDER BY exact_cnt DESC, token""".stripMargin
}
