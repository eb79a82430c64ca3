package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus sampling and normalization for training-data pipelines.
  *
  * Sampling is DETERMINISTIC, content-keyed, and stratification-safe:
  * a doc is kept iff a fixed prefix of md5(text) falls under the rate
  * threshold. No RNG state, no seed plumbing — reruns, retries and
  * backfills select the same docs, on any cluster size, with no
  * coordination (the property `sample(df union df2) == sample(df) union
  * sample(df2)` is what makes this safe at 100 TB where sampling runs
  * incrementally). Lowercase-hex comparison is lexicographic ==
  * numeric, so the predicate is a plain pushable string comparison in
  * both Spark and DuckDB.
  */
object Sampling {

  /** Threshold prefix for a per-mille rate: docs with
    * `substr(md5(text),1,3) < threshold` are kept. 3 hex digits = 4096
    * buckets, so the rate granularity is 1/4096.
    */
  private def hexThreshold(permille: Int): String = {
    require(permille >= 0 && permille <= 1000, s"rate $permille‰ out of range")
    f"${(permille * 4096) / 1000}%03x"
  }

  /** Deterministic content-hash sample at `permille`/1000 rate. */
  def sampleByContent(docs: DataFrame, permille: Int): DataFrame =
    docs.filter(substring(md5(col("text")), 1, 3) < hexThreshold(permille))

  /** Per-language sample audit: total vs sampled doc counts — the
    * stratification check (each stratum is sampled at ~the global rate
    * because the hash is independent of the label).
    */
  def stratifiedSampleAudit(docs: DataFrame, permille: Int): DataFrame =
    docs
      .withColumn(
        "sampled",
        (substring(md5(col("text")), 1, 3) < hexThreshold(permille)).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("sampled")).cast("long").as("n_sampled"))
      .orderBy(col("lang"))

  def stratifiedSampleAuditSql(permille: Int): String =
    s"""SELECT lang, count(*) AS n_docs,
       | CAST(sum(CASE WHEN substr(md5(text), 1, 3) < '${hexThreshold(permille)}'
       |               THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** Normalization-keyed near-exact dedup: lowercase, collapse all
    * whitespace runs, trim — docs differing only in case/spacing share a
    * fingerprint. Per-language distinct-fingerprint counts quantify the
    * duplication the normalization reveals beyond byte-exact dedup.
    */
  def normalizedFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn(
        "nfp",
        md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("nfp")).as("n_distinct_norm"))
      .orderBy(col("lang"))

  /** DuckDB twin: regexp_replace needs the explicit 'g' flag there
    * (Spark replaces all matches by default).
    */
  val NormalizedFingerprintSql: String =
    """SELECT lang, count(*) AS n_docs,
      | count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_distinct_norm
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- fixed-count per-stratum sample --------------------------------

  /** Exactly `min(k, |stratum|)` docs per language, chosen by md5(text)
    * order — the deterministic replacement for a per-group reservoir
    * sample (eval-set carving, per-source caps). Same rerun/backfill
    * stability as [[sampleByContent]]: the "random" order is the content
    * hash, so the selection is coordination-free and identical on any
    * cluster. Ties (identical text twice in a stratum) break on doc_id.
    *
    * Plan shape: ONE per-group window (rank state only); at 100 TB,
    * where a stratum is billions of rows, the production refinement is a
    * two-phase cut — a rate prefilter at ~(k/|stratum|)·slack via the
    * hash threshold, then this exact window over the survivors — same
    * output, window input shrunk by the prefilter rate.
    */
  def sampleKPerGroup(docs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("text")), col("doc_id"))
    docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"))
      .orderBy(col("lang"), col("rank"))
  }

  /** DuckDB twin — same hash order, same tie-break. */
  def sampleKPerGroupSql(k: Int): String =
    s"""SELECT lang, rank, doc_id FROM (
       |  SELECT lang, doc_id,
       |         CAST(row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id)
       |              AS BIGINT) AS rank
       |  FROM documents)
       |WHERE rank <= $k ORDER BY lang, rank""".stripMargin

  // ---- deterministic epoch shuffle / sharding ------------------------

  /** Number of training shards for [[epochShuffle]] (one per hex digit
    * of the hash prefix; widen the prefix for more shards).
    */
  val NumShards = 16

  /** Deterministic epoch shuffle: assign every doc a training shard and
    * an in-shard sequence position, both derived from md5(text) — the
    * dataloader-prep step that turns a curated corpus into a reproducible
    * training order (same order on every rerun, any cluster size, no RNG
    * state; a new "epoch seed" = prepend a salt to the hash input).
    *
    * Shard = first hex digit of the content hash (16-way), so shards are
    * hash-balanced; sequence = rank by (hash, doc_id) WITHIN the shard —
    * a per-shard window, parallel across shards, never a global sort.
    * At 100 TB the in-shard rank uses the same two-level distributed
    * prefix sum as [[graft.operators.Packing]]; the per-shard window
    * here is the small-N formulation of the identical plan.
    */
  def epochShuffle(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
    docs
      .withColumn("h", md5(col("text")))
      // hex digit -> 0..15 via alphabet position (Spark locate == DuckDB
      // strpos, the same bridge the classifier weights use)
      .withColumn(
        "shard",
        (expr("locate(substring(h, 1, 1), '0123456789abcdef')") - 1).cast("long"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("seq"))
      .orderBy(col("shard"), col("seq"))
  }

  /** DuckDB twin — same hash, same shard digit, same in-shard order. */
  val EpochShuffleSql: String =
    """SELECT doc_id, shard, CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS seq
      |FROM (SELECT doc_id, md5(text) AS h,
      |             CAST(strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS BIGINT) AS shard
      |      FROM documents)
      |ORDER BY shard, seq""".stripMargin

  // ---- mixture resampling --------------------------------------------

  /** Target corpus mixture by language, in per-mille (sums to 1000).
    * In a real pipeline these come from the data-mixing recipe (e.g.
    * per-source weights in The Pile / Dolma dataset cards); strata
    * absent from the map are dropped.
    */
  val MixWeightsPermille: Seq[(String, Long)] =
    Seq("en" -> 300L, "de" -> 200L, "es" -> 200L, "fr" -> 150L, "zh" -> 150L)

  /** Deterministic mixture resampling: downsample each language stratum
    * so the surviving corpus matches `MixWeightsPermille` as closely as
    * the 1/4096 hash granularity allows, keeping the largest corpus the
    * targets permit (no stratum is ever upsampled).
    *
    * The feasible corpus size is `T = min_s floor(n_s·1000 / w_s)`; the
    * per-stratum keep threshold is `thr_s = min(4096, floor(w_s·T·4096
    * / (1000·n_s)))` and a doc survives iff the first 3 hex digits of
    * `md5(text)` fall under `thr_s` — the same rerun/backfill-stable,
    * coordination-free selection rule as [[sampleByContent]], now with a
    * per-stratum rate. ALL rate arithmetic is integer (BIGINT div), so
    * the Spark plan and the DuckDB twin cannot drift on float rounding.
    * Overflow bound: `w·t·4096 ≤ n_s·1000·4096`, within BIGINT for
    * strata up to ~2.2e12 docs (ANSI mode fails loudly, never wraps).
    *
    * Plan shape: one hash aggregation for the stratum counts (5 rows),
    * a single-row min, both broadcast back onto the corpus scan — one
    * pass over the data, no global shuffle of documents. At 100 TB the
    * counts frame is |strata| rows; the doc-side work is a narrow
    * md5+compare per row.
    *
    * Output is the per-stratum audit `(lang, n_docs, thr_4096, n_kept)`
    * — all integers, fully deterministic.
    */
  def mixtureResample(docs: DataFrame): DataFrame = {
    val wCol = MixWeightsPermille.foldLeft(lit(0L)) { case (acc, (l, w)) =>
      when(col("lang") === l, lit(w)).otherwise(acc)
    }
    val caps = docs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", wCol)
      .filter(col("w") > 0)
      .withColumn("cap", expr("n_docs * 1000 DIV w"))
    // one-row feasible-size join on a non-foldable constant-1 key —
    // BroadcastHashJoin, not a nested loop (see CorpusSignals.one)
    val t = caps
      .agg(min(col("cap")).as("t"))
      .withColumn("one", CorpusSignals.one(col("t")))
    val thr = caps
      .withColumn("one", CorpusSignals.one(col("cap")))
      .join(broadcast(t), "one")
      .withColumn("thr_4096", least(lit(4096L), expr("w * t * 4096 DIV (1000 * n_docs)")))
      .select(col("lang"), col("n_docs"), col("thr_4096"))
    docs
      .join(broadcast(thr), "lang")
      .withColumn(
        "kept",
        (col("thr_4096") >= 4096 ||
          substring(md5(col("text")), 1, 3) < lpad(lower(hex(col("thr_4096"))), 3, "0"))
          .cast("int"))
      .groupBy(col("lang"), col("n_docs"), col("thr_4096"))
      .agg(sum(col("kept")).cast("long").as("n_kept"))
      .orderBy(col("lang"))
  }

  /** DuckDB twin — identical integer arithmetic (`//` == Spark `DIV`
    * on positive BIGINTs), identical hex-threshold comparison.
    */
  val MixtureResampleSql: String = {
    val values = MixWeightsPermille.map { case (l, w) => s"('$l', $w)" }.mkString(", ")
    s"""WITH w(lang, w) AS (VALUES $values),
       |c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
       |caps AS (SELECT c.lang, n_docs, w.w, n_docs * 1000 // w.w AS cap
       |         FROM c JOIN w USING (lang)),
       |t AS (SELECT min(cap) AS t FROM caps),
       |thr AS (SELECT lang, n_docs,
       |               least(4096, w * t.t * 4096 // (1000 * n_docs)) AS thr_4096
       |        FROM caps, t)
       |SELECT d.lang, thr.n_docs, thr.thr_4096,
       |  CAST(sum(CASE WHEN thr.thr_4096 >= 4096
       |                  OR substr(md5(d.text), 1, 3) < lpad(lower(to_hex(thr.thr_4096)), 3, '0')
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM documents d JOIN thr ON d.lang = thr.lang
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  }

  // ---- deterministic train/val/test split -----------------------------

  /** Deterministic content-keyed train/val/test assignment, reported as
    * per-(source, split) counts. The split key is the first hex digit
    * of `md5(doc_id)`: digits 0-b → train (12/16 = 75%), c-d → val
    * (12.5%), e-f → test (12.5%).
    *
    * Hash-keyed (not random) splitting is the production-correct shape:
    * re-running the pipeline, adding documents, or re-partitioning NEVER
    * moves an existing document across splits — the eval set stays
    * frozen as the corpus grows, with no seed-state to carry. The whole
    * operator is a narrow projection + one vocabulary-small hash agg.
    */
  def trainSplit(docs: DataFrame): DataFrame =
    docs
      .withColumn("d", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn(
        "split",
        when(col("d") < "c", "train").when(col("d") < "e", "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))

  val TrainSplitSql: String =
    """WITH a AS (
      |  SELECT source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS d
      |  FROM documents)
      |SELECT source,
      |       CASE WHEN d < 'c' THEN 'train' WHEN d < 'e' THEN 'val'
      |            ELSE 'test' END AS split,
      |       count(*) AS n_docs
      |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- token-budget corpus selection ---------------------------------

  /** Fraction of the corpus token total that the selection budget
    * covers — the "train on the best 25% by quality" shape.
    */
  val BudgetFraction = 0.25

  /** Token-budget corpus selection — the data-selection step of a
    * training pipeline: keep the highest-quality documents, in
    * (quality DESC, doc_id) order, while the running token total stays
    * within a budget of `BudgetFraction · Σ n_tokens` ("fill the
    * training token budget from the top of the quality ranking").
    * Output: the selected docs with their global running token total,
    * in selection order.
    *
    * The SEMANTICS are a global ordered prefix — but the PLAN never
    * runs a global single-partition sort over corpus rows. The quality
    * score is rounded to 6 dp, so its distinct values live on a
    * bounded grid (≤ 10⁶ + 1 for a [0,1] score) regardless of corpus
    * size; selection decomposes over that grid:
    *
    *   1. one hash agg: per-score token totals (score-grid-sized),
    *   2. a prefix sum over the SCORE-GROUP table (the only global
    *      window — score-grid-bounded rows, never corpus rows),
    *   3. groups whose prefix starts under the budget are candidates
    *      (every fully-funded group plus exactly one boundary group);
    *      docs join back on the score and take a per-SCORE window
    *      (distributed across score partitions, ordered by doc_id —
    *      the global tie-break) whose sum, offset by the group's
    *      prefix, IS the exact global running total; the `≤ budget`
    *      filter then lands exactly where the naive global window
    *      would put it.
    *
    * The oracle states the naive semantics (one global window) — the
    * hash gate proves the decomposition equals it. The within-score
    * windows are themselves skew-proof: [[scoreGroupRunningSum]] runs
    * the two-level [[Packing]] scan inside each score, so even a score
    * value holding a corpus-scale share of docs (the all-stopword
    * quality=0 spam class) never concentrates into one window
    * partition.
    *
    * Docs with zero tokens score NULL quality and are unrankable —
    * excluded on both sides (`n_tokens > 0`).
    */
  def budgetSelect(docs: DataFrame, scanWidth: Long = ScoreScanWidth): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = graft.operators.TextAnalysis.qualityScoreUnordered(docs)
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val budget = q
      .agg(floor(lit(BudgetFraction) * sum(col("n_tokens")).cast("double"))
        .cast("long").as("b"))
      .withColumn("one", CorpusSignals.one(col("b")))
    // score-group table: one row per distinct ROUNDED score — bounded
    // by the 6-dp score grid, not by corpus rows
    val groups = q
      .groupBy(col("quality"))
      .agg(sum(col("n_tokens")).as("g_tokens"))
    val prefixed = groups
      .withColumn(
        "cum_before",
        sum(col("g_tokens")).over(Window.orderBy(col("quality").desc)) - col("g_tokens"))
      .withColumn("one", CorpusSignals.one(col("g_tokens")))
      .join(broadcast(budget), "one")
      .filter(col("cum_before") < col("b"))
      .select(col("quality"), col("cum_before"), col("b"))
    // per-score running totals via the two-level scan (never a
    // corpus-scale window partition even if one score dominates); the
    // group prefix lifts each to the exact global running total
    scoreGroupRunningSum(
      q.join(prefixed, "quality"), Seq("quality"), "n_tokens", "cum_in_score",
      width = scanWidth)
      .withColumn("cum_tokens", col("cum_before") + col("cum_in_score"))
      .filter(col("cum_tokens") <= col("b"))
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("cum_tokens"))
      .orderBy(col("quality").desc, col("doc_id"))
  }

  /** Naive one-window statement of [[budgetSelect]]'s semantics — the
    * oracle, and the spec's equality reference.
    */
  val BudgetSelectSql: String =
    s"""WITH $QualityCteSql,
       |b AS (
       |  SELECT CAST(floor($BudgetFraction * CAST(sum(n_tokens) AS DOUBLE)) AS BIGINT) AS b
       |  FROM q),
       |w AS (
       |  SELECT doc_id, n_tokens, quality,
       |         CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS BIGINT)
       |           AS cum_tokens
       |  FROM q)
       |SELECT doc_id, n_tokens, quality, cum_tokens
       |FROM w CROSS JOIN b WHERE cum_tokens <= b.b
       |ORDER BY quality DESC, doc_id""".stripMargin

  /** The `t/s/q` quality-scoring CTE chain shared by [[BudgetSelectSql]]
    * and [[SelectionCurveSql]] — the DuckDB twin of
    * `TextAnalysis.qualityScoreUnordered` restricted to scoreable docs.
    */
  private lazy val QualityCteSql: String = {
    val stopList =
      graft.operators.TextAnalysis.StopWords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""t AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, source, len(toks) AS nt,
       |         len(list_filter(toks, x -> list_contains($stopList, x))) AS nstop
       |  FROM t),
       |q AS (
       |  SELECT doc_id, source, nt AS n_tokens,
       |         round(CAST(least(nt, 100) AS DOUBLE) / 100.0 *
       |               (1.0 - CAST(nstop AS DOUBLE) / nullif(nt, 0)), 6) AS quality
       |  FROM s WHERE nt > 0)""".stripMargin
  }

  // ---- per-source token budgets ----------------------------------------

  /** [[budgetSelect]] under PER-SOURCE budgets — how real training mixes
    * are actually built (per-domain token allocations à la Dolma/The
    * Pile dataset cards, not one global pool): each source fills
    * `BudgetFraction` of ITS OWN token mass from the top of its quality
    * ranking, so one giant source can never crowd a small one out of
    * the mix. Composes with [[mixtureTemperature]]: the temperature
    * weights pick each source's fraction, this operator materializes
    * the selection.
    *
    * Same decomposed plan as [[budgetSelect]] with `source` prepended
    * to every key: the grid is (source, quality) groups, the prefix
    * window partitions BY SOURCE over grid rows, budgets join unhinted
    * (source-bounded — AQE broadcasts), and the within-group running
    * sums run the two-level [[scoreGroupRunningSum]] scan keyed by
    * (source, quality). No window anywhere ranges over corpus-scale
    * rows.
    */
  def budgetSelectBySource(docs: DataFrame, scanWidth: Long = ScoreScanWidth): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = graft.operators.TextAnalysis.qualityScoreBySource(docs)
      .filter(col("n_tokens") > 0)
    val budgets = q
      .groupBy(col("source"))
      .agg(floor(lit(BudgetFraction) * sum(col("n_tokens")).cast("double"))
        .cast("long").as("b"))
    val prefixed = q
      .groupBy(col("source"), col("quality"))
      .agg(sum(col("n_tokens")).as("g_tokens"))
      .withColumn(
        "cum_before",
        sum(col("g_tokens")).over(
          Window.partitionBy(col("source")).orderBy(col("quality").desc)) - col("g_tokens"))
      .join(budgets, "source")
      .filter(col("cum_before") < col("b"))
      .select(col("source"), col("quality"), col("cum_before"), col("b"))
    scoreGroupRunningSum(
      q.join(prefixed, Seq("source", "quality")),
      Seq("source", "quality"), "n_tokens", "cum_in_score",
      width = scanWidth)
      .withColumn("cum_tokens", col("cum_before") + col("cum_in_score"))
      .filter(col("cum_tokens") <= col("b"))
      .select(
        col("doc_id"), col("source"), col("n_tokens"), col("quality"), col("cum_tokens"))
      .orderBy(col("source"), col("quality").desc, col("doc_id"))
  }

  /** Naive per-source one-window statement of [[budgetSelectBySource]]. */
  val BudgetSelectBySourceSql: String =
    s"""WITH $QualityCteSql,
       |b AS (
       |  SELECT source,
       |         CAST(floor($BudgetFraction * CAST(sum(n_tokens) AS DOUBLE)) AS BIGINT) AS b
       |  FROM q GROUP BY 1),
       |w AS (
       |  SELECT doc_id, source, n_tokens, quality,
       |         CAST(sum(n_tokens) OVER (
       |           PARTITION BY source ORDER BY quality DESC, doc_id) AS BIGINT)
       |           AS cum_tokens
       |  FROM q)
       |SELECT doc_id, source, n_tokens, quality, cum_tokens
       |FROM w JOIN b USING (source) WHERE cum_tokens <= b.b
       |ORDER BY source, quality DESC, doc_id""".stripMargin

  // ---- skew-proof within-score running sums -----------------------------

  /** DEFAULT docs-per-sub-group of the two-level within-score scan
    * (the [[Packing.GroupWidth]] pattern) — deliberately small so test
    * SFs exercise the multi-sub-group path. At this fixed width a
    * dominant score's worst partition holds n_score/64 rows: a 64×
    * REDUCTION of the skew, not the √n bound the balanced width gives
    * (ADVICE r13 asked for exactly this distinction). Corpus-scale
    * deployments pass [[balancedScanWidth]] of their (approximate)
    * corpus count through the `scanWidth` parameter of
    * [[budgetSelect]]/[[budgetSelectBySource]] instead.
    */
  val ScoreScanWidth = 64L

  /** The balanced sub-group width for `n` rows: ⌈√n⌉ floored at the
    * test default, which makes the two-level scan's worst partition
    * max(width, n/width) ≈ √n — the bound the scaladoc promises. One
    * cheap count (parquet metadata, or a cached frame's forced count)
    * buys the literal; the dial exists because the width must be a
    * plan-time constant (`doc_id div width` partitions must be
    * CONTIGUOUS id ranges for the sub-group offsets to compose).
    */
  def balancedScanWidth(n: Long): Long =
    math.max(ScoreScanWidth, math.round(math.sqrt(n.toDouble)))

  /** Within-score running sum of `valueCol` in doc_id order, decomposed
    * so NO window partition ever holds a corpus-scale row count — the
    * escalation the budgetSelect scaladoc promised for the day one score
    * value (the all-stopword quality=0 spam class, say) concentrates a
    * corpus-scale share of documents:
    *
    *   1. sub-group = doc_id div [[ScoreScanWidth]]: the inner window
    *      partitions by (score, sub-group) — ≤ width rows each;
    *   2. per-(score, sub-group) totals prefix-sum into sub-group
    *      offsets — a window per score over n/width rows;
    *   3. offsets join back (unhinted — AQE decides) and lift each
    *      inner sum to the exact within-score running total.
    *
    * Worst partition = max(width, n_score/width) rows — √n at the
    * balanced width — versus n_score for the naive per-score window.
    * Identical output by construction; the hash gate re-proves it
    * against the naive one-window oracle on every run.
    */
  private[operators] def scoreGroupRunningSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      out: String,
      width: Long = ScoreScanWidth): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val g = df.withColumn("_grp", expr(s"doc_id div $width"))
    val within = g.withColumn(
      "_cum_sub",
      sum(col(valueCol)).over(
        Window.partitionBy(keys :+ col("_grp"): _*).orderBy(col("doc_id"))))
    val offs = g
      .groupBy(keys :+ col("_grp"): _*)
      .agg(sum(col(valueCol)).as("_sub_total"))
      .withColumn(
        "_sub_offset",
        coalesce(
          sum(col("_sub_total")).over(
            Window.partitionBy(keys: _*).orderBy(col("_grp"))) - col("_sub_total"),
          lit(0L)))
      .select(keys ++ Seq(col("_grp"), col("_sub_offset")): _*)
    within
      .join(offs, keyCols :+ "_grp")
      .withColumn(out, col("_sub_offset") + col("_cum_sub"))
      .drop("_grp", "_cum_sub", "_sub_offset")
  }

  // ---- quality selection curve ----------------------------------------

  /** The quality-threshold selection curve: for every DISTINCT quality
    * score, how many documents and tokens survive a "keep everything
    * scoring ≥ this" filter — the table a curator reads to pick the
    * [[budgetSelect]] budget or a filter threshold in the first place
    * (token-retention fraction vs quality cut, one row per cut).
    *
    * Scale shape: one hash agg onto the bounded 6-dp score grid, then
    * a prefix sum over the GRID-sized group table — the only window in
    * the plan ranges over score-grid rows, never corpus rows. The one
    * float column (`token_frac`) is a single division of two exact
    * BIGINTs rounded to 6 dp — deterministic across engines.
    */
  def selectionCurve(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = graft.operators.TextAnalysis.qualityScoreUnordered(docs)
      .filter(col("n_tokens") > 0)
    val grid = q
      .groupBy(col("quality"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val total = grid
      .agg(sum(col("n_tokens")).as("t_tokens"))
      .withColumn("one", CorpusSignals.one(col("t_tokens")))
    val w = Window.orderBy(col("quality").desc)
    grid
      .withColumn("cum_docs", sum(col("n_docs")).over(w))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("one", CorpusSignals.one(col("n_docs")))
      .join(broadcast(total), "one")
      .withColumn(
        "token_frac",
        round(col("cum_tokens").cast("double") / col("t_tokens").cast("double"), 6))
      .select(
        col("quality"), col("n_docs"), col("n_tokens"),
        col("cum_docs"), col("cum_tokens"), col("token_frac"))
      .orderBy(col("quality").desc)
  }

  val SelectionCurveSql: String =
    s"""WITH $QualityCteSql,
       |g AS (
       |  SELECT quality, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |  FROM q GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM g),
       |c AS (
       |  SELECT quality, n_docs, n_tokens,
       |         CAST(sum(n_docs) OVER (ORDER BY quality DESC) AS BIGINT) AS cum_docs,
       |         CAST(sum(n_tokens) OVER (ORDER BY quality DESC) AS BIGINT) AS cum_tokens
       |  FROM g)
       |SELECT quality, n_docs, n_tokens, cum_docs, cum_tokens,
       |       round(CAST(cum_tokens AS DOUBLE) / CAST(t_tokens AS DOUBLE), 6) AS token_frac
       |FROM c CROSS JOIN tot
       |ORDER BY quality DESC""".stripMargin

  // ---- temperature-scaled source mixing ---------------------------------

  /** Temperature-scaled multi-source mixing weights (α = 0.5, the
    * up-weight-the-tail exponent of multilingual/multi-source training
    * mixes à la mBERT/XLM-R: sample source i with probability
    * p_i^α / Σ p_j^α instead of its natural share p_i). Output per
    * source: natural token share, temperature weight, and the boost
    * factor the temperature applies — the dataset-card table for a
    * training mix.
    *
    * Cross-engine float discipline (the Graph fixed-point technique):
    * √n_tokens is computed once per source and immediately quantized to
    * an exact BIGINT of micro-units via `floor(√n · 10⁶ + 0.5)` — IEEE
    * sqrt/mul/add/floor are all bit-deterministic, so both engines
    * quantize the identical double to the identical integer (`round()`
    * would NOT be safe here: Spark routes doubles through BigDecimal's
    * shortest-string repr while DuckDB calls std::round on the raw
    * bits, and they disagree within half an ulp of a .5 boundary).
    * Every SUM then runs over exact integers, immune to accumulation
    * order, and each output float is a single division of two exact
    * BIGINTs rounded to 6 dp. One corpus scan, one source-bounded hash
    * agg, one one-row broadcast — scale-free.
    */
  def mixtureTemperature(docs: DataFrame): DataFrame = {
    val g = docs
      .withColumn("nt", size(expr(Dedup.TokensExpr)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).cast("long").as("n_tokens"))
      .withColumn(
        "s_fp",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
    val total = g
      .agg(sum(col("s_fp")).as("sum_fp"), sum(col("n_tokens")).as("t_tokens"))
      .withColumn("one", CorpusSignals.one(col("sum_fp")))
    g.withColumn("one", CorpusSignals.one(col("s_fp")))
      .join(broadcast(total), "one")
      .withColumn(
        "natural_share",
        round(col("n_tokens").cast("double") / col("t_tokens").cast("double"), 6))
      .withColumn(
        "temp_weight",
        round(col("s_fp").cast("double") / col("sum_fp").cast("double"), 6))
      .withColumn("boost", round(col("temp_weight") / col("natural_share"), 6))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        col("natural_share"), col("temp_weight"), col("boost"))
      .orderBy(col("source"))
  }

  val MixtureTemperatureSql: String =
    s"""WITH d AS (
       |  SELECT source,
       |         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt
       |  FROM documents),
       |g AS (
       |  SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
       |  FROM d GROUP BY 1),
       |s AS (
       |  SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
       |              AS s_fp
       |  FROM g),
       |tot AS (
       |  SELECT CAST(sum(s_fp) AS BIGINT) AS sum_fp,
       |         CAST(sum(n_tokens) AS BIGINT) AS t_tokens
       |  FROM s)
       |SELECT source, n_docs, n_tokens,
       |       round(CAST(n_tokens AS DOUBLE) / CAST(t_tokens AS DOUBLE), 6) AS natural_share,
       |       round(CAST(s_fp AS DOUBLE) / CAST(sum_fp AS DOUBLE), 6) AS temp_weight,
       |       round(round(CAST(s_fp AS DOUBLE) / CAST(sum_fp AS DOUBLE), 6) /
       |             round(CAST(n_tokens AS DOUBLE) / CAST(t_tokens AS DOUBLE), 6), 6) AS boost
       |FROM s CROSS JOIN tot
       |ORDER BY source""".stripMargin
}
