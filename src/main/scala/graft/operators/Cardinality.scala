package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog: the mergeable distinct-count sketch, built
  * so BOTH engines replay it bit-exactly (the Count-Min discipline from
  * [[CorpusSignals]] applied to cardinality).
  *
  * Why another sketch when `approx_count_distinct` exists (and is
  * already certified with a tolerance band in
  * [[CorpusSignals.sketchCertify]]): Spark's HLL++ is engine-internal —
  * its registers can't be replayed by an independent engine, persisted
  * as an open format, or merged with registers produced elsewhere. This
  * sketch is the OPEN twin: md5-derived registers any engine can
  * recompute, so the gate pins the whole estimator (hash → register →
  * harmonic sum → estimate) with zero probabilistic tolerance, and the
  * register log is a portable artifact (merge = per-index MAX, so
  * partials from different days / engines / clusters compose).
  *
  * Geometry: p=8 → m=256 registers. The hash is the first 15 hex digits
  * of md5(key) — a uniform 60-bit integer both engines extract with
  * identical arithmetic (`conv(...,16,10)` / `('0x'||...)::BIGINT`, the
  * [[CorpusSignals]] idiom). Low 8 bits index the register; the
  * remaining 52 bits w set the rank rho = 53 − bitlen(w) (w=0 → 53),
  * with bitlen via `length(bin(w))` — minimal-length binary strings in
  * both engines.
  *
  * Estimator branches (the full standard HLL serve path, r12 verdict
  * #5 — the raw-only estimator was valid only above the 2.5·m
  * linear-counting zone): when the raw estimate is ≤ 2.5·m and empty
  * registers remain, serve LINEAR COUNTING `m·ln(m/V)` (V = empty
  * registers); otherwise the raw harmonic estimate. Replay exactness
  * is preserved on both branches: the branch DECISION compares a
  * bit-identical double (integer-exact harmonic sum, shared literal
  * constants) in both engines, and the LC value's one transcendental
  * has only 255 possible inputs (V ∈ 1..255 at m=256) —
  * CardinalitySpec proves every `round(m·ln(m/V), 3)` sits ≥ 10⁻⁶
  * away from a rounding boundary, so a last-ulp libm difference
  * between engines cannot flip the rounded gate value. The raw branch
  * stays transcendental-free: one integer-exact harmonic sum followed
  * by IEEE-deterministic double division (the exact-BIGINT-fixed-point
  * lesson from [[Graph.pageRankTopK]]).
  *
  * 100 TB shape: the scan folds to ≤ m partial rows per task
  * (map-combined max), one m-row shuffle, O(1) state — the certificate's
  * exact `count(DISTINCT)` is the measurement cost, NOT the production
  * query (same argument as `heavy_hitters_cm`).
  */
object Cardinality {

  /** Registers (p=8). */
  val HllM = 256

  /** rho for a zero 52-bit tail; also the harmonic scale exponent. */
  private val RhoCap = 53

  /** 2^53 — the scaled harmonic term of an EMPTY register. */
  private val EmptyTerm = 9007199254740992L

  /** Raw-HLL bias-correction constant, written as the same literal
    * expression in both engines: alpha_m = 0.7213 / (1 + 1.079/m).
    */
  private def alphaExpr: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))

  /** (idx, rho) expressions for `key` — the shared hash→register
    * derivation every HLL variant (global, grouped, overlap) builds on.
    */
  private def hashCols(key: Column): (Column, Column) = {
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val w = shiftright(h, 8) // h ≥ 0 (60-bit), so >> is the exact integer div
    (h % HllM, when(w === 0, RhoCap).otherwise(lit(RhoCap) - length(bin(w))))
  }

  /** Exact scaled harmonic denominator from a summary's
    * (nonzero, present_denom) — empty registers contribute 2^53 via the
    * closed form, no grid join.
    */
  private def denomOf(nonzero: Column, presentDenom: Column): Column =
    presentDenom + (lit(HllM.toLong) - nonzero) * lit(EmptyTerm)

  /** The full serve estimator (raw harmonic + linear-counting branch)
    * from a summary's (nonzero, present_denom) — the one expression
    * [[hllSummarize]], [[hllGroupedCertify]] and [[hllOverlapCertify]]
    * all serve from, so the replay-exactness argument (scaladoc above)
    * is proven once.
    */
  private def estOf(nonzero: Column, presentDenom: Column): Column = {
    val rawEst = alphaExpr * lit(65536.0) * lit(EmptyTerm.toDouble) /
      denomOf(nonzero, presentDenom).cast("double")
    val emptyRegs = lit(HllM.toLong) - nonzero
    when(
      rawEst <= lit(2.5) * lit(HllM.toDouble) && emptyRegs > 0,
      round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / emptyRegs.cast("double")), 3))
      .otherwise(round(rawEst, 3))
  }

  /** Per-register partials of `key` over `df`: (idx, r) with r ≥ 1,
    * ≤ m rows, map-side combined. Mergeable: max per idx.
    */
  def hllRegisterPartials(df: DataFrame, key: Column): DataFrame = {
    val (idx, rho) = hashCols(key)
    df.select(idx.as("idx"), rho.as("rho"))
      .groupBy(col("idx"))
      .agg(max(col("rho")).as("r"))
  }

  /** Fold merged register partials + the exact count into the one-row
    * certificate: (m, nonzero, denom, est, exact, err_ok). `denom` is
    * the EXACT scaled harmonic sum Σ 2^(53−r_j) (empty registers
    * contribute 2^53 via the closed form, no grid join), `est` the raw
    * HLL estimate rounded 3dp, `err_ok` the ≤20% certificate — every
    * column identical in both engines by construction.
    */
  def hllSummarize(partials: DataFrame, exactDf: DataFrame): DataFrame = {
    // combine the two one-row aggregates WITHOUT a join (a constant-key
    // join of 1-row frames constant-folds into a nested-loop join,
    // which the repo-wide plan audit forbids): pad each side with null
    // columns, union, and fold with max-ignoring-nulls
    // coalesce: an EMPTY corpus has no partials — every register is
    // empty, denom = m·2^53, est = alpha·m (the defined HLL zero point)
    val s = partials
      .agg(
        count(lit(1)).as("nonzero"),
        coalesce(
          sum(expr(s"shiftleft(1L, CAST($RhoCap - r AS INT))")),
          lit(0L)).as("present_denom"))
      .withColumn("exact", lit(null).cast("long"))
    val e = exactDf.select(
      lit(null).cast("long").as("nonzero"),
      lit(null).cast("long").as("present_denom"),
      col("exact"))
    val folded = s.unionByName(e).agg(
      max(col("nonzero")).as("nonzero"),
      max(col("present_denom")).as("present_denom"),
      max(col("exact")).as("exact"))
    // standard HLL serve: linear counting below the 2.5·m zone (both
    // the branch predicate and the LC value replay exactly — scaladoc)
    val est = estOf(col("nonzero"), col("present_denom"))
    folded.select(
      lit(HllM).as("m"),
      col("nonzero"),
      denomOf(col("nonzero"), col("present_denom")).as("denom"),
      est.as("est"),
      col("exact"),
      (abs(est - col("exact").cast("double")) <=
        lit(0.2) * col("exact").cast("double")).as("err_ok"))
  }

  /** One-shot certificate over a frame. */
  def hllCertify(df: DataFrame, key: Column): DataFrame =
    hllSummarize(
      hllRegisterPartials(df, key),
      df.agg(countDistinct(key).as("exact")))

  /** Serve from an APPEND-ONLY register log (the streaming deployment:
    * each micro-batch appended its ≤ m partial rows); merge = per-idx
    * MAX, so fragmentation can never lose or double mass — then the
    * same certificate against the batch table's exact count.
    */
  def hllServeFromLog(log: DataFrame, batchDf: DataFrame, key: Column): DataFrame =
    hllSummarize(
      log.groupBy(col("idx")).agg(max(col("r")).as("r")),
      batchDf.agg(countDistinct(key).as("exact")))

  /** DuckDB replay of [[hllCertify]] — the whole estimator (both
    * serve branches) recomputed from raw rows, parameterized over the
    * keyed table so small-cardinality corpora gate the linear-counting
    * branch on a second entry.
    */
  def hllCertifySql(
      table: String = "lineitem",
      keyExpr: String = "l_orderkey"): String = {
    val raw =
      s"""0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * $EmptyTerm.0
         |             / CAST(present_denom + ($HllM - nonzero) * $EmptyTerm AS DOUBLE)""".stripMargin
    val est =
      s"""CASE WHEN $raw <= 2.5 * 256.0 AND ($HllM - nonzero) > 0
         |            THEN round(256.0 * ln(256.0 / CAST($HllM - nonzero AS DOUBLE)), 3)
         |            ELSE round($raw, 3) END""".stripMargin
    s"""WITH h AS (
       |  SELECT CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM $table),
       |p AS (
       |  SELECT h % $HllM AS idx,
       |         CASE WHEN h // $HllM = 0 THEN $RhoCap
       |              ELSE $RhoCap - length(bin(h // $HllM)) END AS rho
       |  FROM h),
       |r AS (SELECT idx, max(rho) AS r FROM p GROUP BY 1),
       |s AS (SELECT count(*) AS nonzero,
       |             CAST(sum(1::BIGINT << ($RhoCap - r)) AS BIGINT) AS present_denom
       |      FROM r),
       |e AS (SELECT count(DISTINCT $keyExpr) AS exact FROM $table)
       |SELECT $HllM AS m, nonzero,
       |       present_denom + ($HllM - nonzero) * $EmptyTerm AS denom,
       |       $est AS est,
       |       exact,
       |       abs($est
       |           - CAST(exact AS DOUBLE)) <= 0.2 * CAST(exact AS DOUBLE) AS err_ok
       |FROM s, e""".stripMargin
  }

  def hllOrderKeysSql: String = hllCertifySql()

  /** GROUPED certificate: one sketch per `grp` value — the shape a
    * per-language / per-source corpus monitor actually serves
    * (registers keyed by (group, idx), merge still per-key MAX). Scale:
    * register state is groups × m rows, the exact count is the
    * certificate's measurement cost. On the gate fixture the groups
    * sit BELOW the 2.5·m linear-counting zone at sf0.01 and above it
    * at sf0.1, so the dual-SF replay exercises both serve branches of
    * the same entry.
    */
  def hllGroupedCertify(
      df: DataFrame,
      grp: Column,
      key: Column,
      grpName: String): DataFrame = {
    val (idx, rho) = hashCols(key)
    val regs = df
      .select(grp.as("grp"), idx.as("idx"), rho.as("rho"))
      .groupBy(col("grp"), col("idx"))
      .agg(max(col("rho")).as("r"))
    val s = regs
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("nonzero"),
        sum(expr(s"shiftleft(1L, CAST($RhoCap - r AS INT))")).as("present_denom"))
    val e = df.groupBy(grp.as("grp")).agg(countDistinct(key).as("exact"))
    val est = estOf(col("nonzero"), col("present_denom"))
    s.join(e, Seq("grp"))
      .select(
        col("grp").as(grpName),
        lit(HllM).as("m"),
        col("nonzero"),
        denomOf(col("nonzero"), col("present_denom")).as("denom"),
        est.as("est"),
        col("exact"),
        (abs(est - col("exact").cast("double")) <=
          lit(0.2) * col("exact").cast("double")).as("err_ok"))
      .orderBy(col(grpName))
  }

  /** Set-operation serve: estimate the OVERLAP of two key populations
    * (A = rows where `inA`, B = rows where `inB`) by
    * inclusion–exclusion over three sketches — est(A) + est(B) −
    * est(A∪B), where the UNION sketch is the per-idx MAX-MERGE of A's
    * and B's registers, never a rescan: the estimate any two
    * independently-sketched corpora (two days, two engines, two
    * clusters) can serve without exchanging raw keys. One scan, one
    * m-row shuffle (conditional per-side maxes), the exact panel is
    * the certificate's measurement cost.
    */
  def hllOverlapCertify(
      df: DataFrame,
      key: Column,
      inA: Column,
      inB: Column): DataFrame = {
    val rows = df.filter(inA || inB).select(key.as("k"), inA.as("a"), inB.as("b"))
    // exact membership panel: distinct keys with side flags, then counts
    val exact = rows
      .groupBy(col("k"))
      .agg(max(col("a")).as("a"), max(col("b")).as("b"))
      .agg(
        count(when(col("a"), 1)).as("exact_a"),
        count(when(col("b"), 1)).as("exact_b"),
        count(lit(1)).as("exact_union"),
        count(when(col("a") && col("b"), 1)).as("exact_overlap"))
    val (idx, rho) = hashCols(col("k"))
    // per-side registers off ONE scan: conditional maxes per idx; the
    // union register is the MAX-MERGE of the two (rho ≥ 1, so 0=absent)
    val regs = rows
      .select(idx.as("idx"), rho.as("rho"), col("a"), col("b"))
      .groupBy(col("idx"))
      .agg(
        max(when(col("a"), col("rho"))).as("ra"),
        max(when(col("b"), col("rho"))).as("rb"))
      .withColumn(
        "ru",
        greatest(coalesce(col("ra"), lit(0)), coalesce(col("rb"), lit(0))))
    // coalesce: the hllSummarize empty-corpus zero point — no rows →
    // pd = 0, every register empty, LC serves V=m → est 0.0
    def sh(c: String) =
      coalesce(sum(expr(s"shiftleft(1L, CAST($RhoCap - $c AS INT))")), lit(0L))
    val summ = regs.agg(
      count(col("ra")).as("nz_a"),
      sh("ra").as("pd_a"), // null rho → null term, sum skips it
      count(col("rb")).as("nz_b"),
      sh("rb").as("pd_b"),
      count(lit(1)).as("nz_u"),
      sh("ru").as("pd_u"))
    // fold the two one-row aggregates WITHOUT a join (the hllSummarize
    // pad-union-max discipline: constant-key 1-row joins constant-fold
    // into nested-loop joins, forbidden suite-wide)
    val summCols = Seq("nz_a", "pd_a", "nz_b", "pd_b", "nz_u", "pd_u")
    val exactCols = Seq("exact_a", "exact_b", "exact_union", "exact_overlap")
    val sPad = exactCols.foldLeft(summ)((d, c) => d.withColumn(c, lit(null).cast("long")))
    val ePad = exact.select(
      summCols.map(c => lit(null).cast("long").as(c)) ++ exactCols.map(col): _*)
    val aggs = (summCols ++ exactCols).map(c => max(col(c)).as(c))
    val folded = sPad.unionByName(ePad).agg(aggs.head, aggs.tail: _*)
    val estA = estOf(col("nz_a"), col("pd_a"))
    val estB = estOf(col("nz_b"), col("pd_b"))
    val estU = estOf(col("nz_u"), col("pd_u"))
    val overlapEst = round(estA + estB - estU, 3)
    folded.select(
      lit(HllM).as("m"),
      estA.as("est_a"),
      estB.as("est_b"),
      estU.as("est_union"),
      overlapEst.as("overlap_est"),
      col("exact_a"),
      col("exact_b"),
      col("exact_union"),
      col("exact_overlap"),
      // inclusion–exclusion compounds three estimators' errors, so the
      // certificate bound is relative to the UNION size (the standard
      // sketch-intersection error model), not the overlap itself
      (abs(overlapEst - col("exact_overlap").cast("double")) <=
        lit(0.2) * col("exact_union").cast("double")).as("err_ok"))
  }

  // ---- DuckDB replays of the grouped / overlap certificates --------

  /** SQL of the serve estimator over summary columns `nz`/`pd` — the
    * textual twin of [[estOf]], shared by both replays below.
    */
  private def estSql(nz: String, pd: String): String = {
    val raw =
      s"""0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * $EmptyTerm.0
         |             / CAST($pd + ($HllM - $nz) * $EmptyTerm AS DOUBLE)""".stripMargin
    s"""CASE WHEN $raw <= 2.5 * 256.0 AND ($HllM - $nz) > 0
       |            THEN round(256.0 * ln(256.0 / CAST($HllM - $nz AS DOUBLE)), 3)
       |            ELSE round($raw, 3) END""".stripMargin
  }

  def hllGroupedCertifySql(
      table: String,
      grpExpr: String,
      keyExpr: String,
      grpName: String): String =
    s"""WITH h AS (
       |  SELECT $grpExpr AS grp, $keyExpr AS k,
       |         CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM $table),
       |p AS (
       |  SELECT grp, h % $HllM AS idx,
       |         CASE WHEN h // $HllM = 0 THEN $RhoCap
       |              ELSE $RhoCap - length(bin(h // $HllM)) END AS rho
       |  FROM h),
       |r AS (SELECT grp, idx, max(rho) AS r FROM p GROUP BY 1, 2),
       |s AS (SELECT grp, count(*) AS nonzero,
       |             CAST(sum(1::BIGINT << ($RhoCap - r)) AS BIGINT) AS present_denom
       |      FROM r GROUP BY 1),
       |e AS (SELECT grp, count(DISTINCT k) AS exact FROM h GROUP BY 1)
       |SELECT s.grp AS $grpName, $HllM AS m, nonzero,
       |       present_denom + ($HllM - nonzero) * $EmptyTerm AS denom,
       |       ${estSql("nonzero", "present_denom")} AS est,
       |       exact,
       |       abs(${estSql("nonzero", "present_denom")}
       |           - CAST(exact AS DOUBLE)) <= 0.2 * CAST(exact AS DOUBLE) AS err_ok
       |FROM s JOIN e USING (grp) ORDER BY 1""".stripMargin

  def hllOverlapSql(
      table: String,
      keyExpr: String,
      aExpr: String,
      bExpr: String): String = {
    val ov = s"round(${estSql("nz_a", "pd_a")} + ${estSql("nz_b", "pd_b")}" +
      s" - ${estSql("nz_u", "pd_u")}, 3)"
    s"""WITH rows0 AS (
       |  SELECT $keyExpr AS k, $aExpr AS a, $bExpr AS b
       |  FROM $table WHERE ($aExpr) OR ($bExpr)),
       |keyed AS (SELECT k, max(a) AS a, max(b) AS b FROM rows0 GROUP BY k),
       |ex AS (SELECT count(*) FILTER (a) AS exact_a,
       |              count(*) FILTER (b) AS exact_b,
       |              count(*) AS exact_union,
       |              count(*) FILTER (a AND b) AS exact_overlap
       |       FROM keyed),
       |h AS (SELECT CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
       |             a, b
       |      FROM rows0),
       |p AS (SELECT h % $HllM AS idx,
       |             CASE WHEN h // $HllM = 0 THEN $RhoCap
       |                  ELSE $RhoCap - length(bin(h // $HllM)) END AS rho, a, b
       |      FROM h),
       |regs AS (SELECT idx,
       |                max(rho) FILTER (a) AS ra,
       |                max(rho) FILTER (b) AS rb
       |         FROM p GROUP BY 1),
       |s AS (SELECT count(ra) AS nz_a,
       |             CAST(sum(1::BIGINT << ($RhoCap - ra)) AS BIGINT) AS pd_a,
       |             count(rb) AS nz_b,
       |             CAST(sum(1::BIGINT << ($RhoCap - rb)) AS BIGINT) AS pd_b,
       |             count(*) AS nz_u,
       |             CAST(sum(1::BIGINT << ($RhoCap -
       |               greatest(coalesce(ra, 0), coalesce(rb, 0)))) AS BIGINT) AS pd_u
       |      FROM regs)
       |SELECT $HllM AS m,
       |       ${estSql("nz_a", "pd_a")} AS est_a,
       |       ${estSql("nz_b", "pd_b")} AS est_b,
       |       ${estSql("nz_u", "pd_u")} AS est_union,
       |       $ov AS overlap_est,
       |       exact_a, exact_b, exact_union, exact_overlap,
       |       abs($ov - CAST(exact_overlap AS DOUBLE))
       |         <= 0.2 * CAST(exact_union AS DOUBLE) AS err_ok
       |FROM s, ex""".stripMargin
  }
}
