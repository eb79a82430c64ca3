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

  /** Per-register partials of `key` over `df`: (idx, r) with r ≥ 1,
    * ≤ m rows, map-side combined. Mergeable: max per idx.
    */
  def hllRegisterPartials(df: DataFrame, key: Column): DataFrame = {
    val h = conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    val w = shiftright(h, 8) // h ≥ 0 (60-bit), so >> is the exact integer div
    df.select(
        (h % HllM).as("idx"),
        when(w === 0, RhoCap).otherwise(lit(RhoCap) - length(bin(w))).as("rho"))
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
    val denom =
      col("present_denom") + (lit(HllM.toLong) - col("nonzero")) * lit(EmptyTerm)
    val rawEst =
      alphaExpr * lit(65536.0) * lit(EmptyTerm.toDouble) / denom.cast("double")
    val emptyRegs = lit(HllM.toLong) - col("nonzero")
    // standard HLL serve: linear counting below the 2.5·m zone (both
    // the branch predicate and the LC value replay exactly — scaladoc)
    val est = when(
      rawEst <= lit(2.5) * lit(HllM.toDouble) && emptyRegs > 0,
      round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / emptyRegs.cast("double")), 3))
      .otherwise(round(rawEst, 3))
    folded.select(
      lit(HllM).as("m"),
      col("nonzero"),
      denom.as("denom"),
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
}
