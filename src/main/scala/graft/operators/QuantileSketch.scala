package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: the ORDER-STATISTICS member of the open
  * sketch family ([[CorpusSignals]] Count-Min = frequency,
  * [[Cardinality]] HLL = cardinality, this = quantiles), built on the
  * same replay-exact discipline — integer bin counts over FIXED,
  * data-independent edges, one IEEE-deterministic interpolation at
  * serve time, zero probabilistic tolerance in the gate.
  *
  * Why fixed edges (the [[Drift]] PSI argument): data-derived bounds
  * (the [[Profiling.valueHistogram]] shape) change when the data does,
  * so yesterday's histogram can't merge with today's. Fixed edges make
  * the counts ADDITIVE across days / shards / engines — the streaming
  * twin appends per-batch count frames and serving merges by summation
  * (the Count-Min pattern), replay-safe on any boundary.
  *
  * Geometry: 1024 bins of width 0.5 over the pinned domain [0, 512),
  * plus underflow (-1) and overflow (1024) sentinel bins so
  * out-of-domain mass is COUNTED, never silently clamped into an edge
  * bin. The bin function is `floor(value / 0.5)` — division by a power
  * of two is exact in IEEE arithmetic, so bin assignment agrees
  * bit-for-bit across engines. Estimate error for an in-domain quantile
  * is bounded by the bin width plus rank-interpolation slack in sparse
  * regions; the certificate measures the realized |est − exact| against
  * [[Tolerance]], with BOTH engines computing the same deterministic
  * boolean (no flake surface).
  *
  * 100 TB shape: one scan folds to ≤ 1026 integer partials per task
  * (map-side combine), one ≤ 1026-row shuffle; the serve-time window
  * runs over the SKETCH, never the data. The exact `percentile` twin is
  * the certificate's measurement cost, not the production query.
  */
object QuantileSketch {

  /** Bins over [0, 512) — width 0.5 (a power of two, exact division). */
  val Bins = 1024
  val Width = 0.5
  val DomainHi: Double = Bins * Width

  /** Absolute certificate bound on |est − exact percentile|: the bin
    * width plus headroom for rank-interpolation differences in sparse
    * tail regions (deterministic per fixture; the margin guards against
    * FIXTURE regeneration, not randomness — both engines compute the
    * same boolean either way).
    */
  val Tolerance = 2.0

  /** Quantile panel under the gate. */
  val Quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** Per-bin counts of `v`: (bin, cnt), ≤ [[Bins]]+2 rows, additive. */
  def binCounts(df: DataFrame, v: Column): DataFrame =
    df.select(
        when(v < 0.0, lit(-1L))
          .when(v >= DomainHi, lit(Bins.toLong))
          .otherwise(floor(v / lit(Width)).cast("long")).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Serve the quantile panel from merged bin counts, certified against
    * the exact percentiles of `exactDf.<valueCol>`: one row per q —
    * (q, est, exact_pct, err_ok). The rank target is `q·n` and the
    * estimate interpolates linearly inside the covering bin:
    * `bin·w + w·(q·n − cum_before)/cnt` — identical arithmetic in both
    * engines. The covering bin is a min-of-when conditional aggregate
    * over the ≤ 1026-row sketch (no join against data, no window over
    * data); the one-row exact panel attaches via the non-foldable-key
    * broadcast join ([[Profiling.valueHistogram]] discipline).
    */
  def serveQuantiles(counts: DataFrame, exactDf: DataFrame, valueCol: String): DataFrame = {
    val w = Window.orderBy(col("bin"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("prev", col("cum") - col("cnt"))
    val perQ = Quantiles.map { q =>
      cum
        .agg(min(when(col("cum") >= lit(q) * col("n"),
          struct(col("bin"), col("prev"), col("cnt"), col("n")))).as("hit"))
        .select(
          lit(q).as("q"),
          round(
            col("hit.bin").cast("double") * lit(Width) +
              lit(Width) * (lit(q) * col("hit.n").cast("double") - col("hit.prev").cast("double")) /
              col("hit.cnt").cast("double"), 6).as("est"))
    }.reduce(_ unionByName _)
    val exactCols = Quantiles.zipWithIndex.map { case (q, i) =>
      round(expr(s"percentile($valueCol, $q)"), 6).as(s"x$i")
    }
    val exact = exactDf
      .agg(exactCols.head, exactCols.tail: _*)
      .withColumn("one", CorpusSignals.one(col("x0")))
    perQ
      .withColumn("one", CorpusSignals.one(col("q")))
      .join(broadcast(exact), "one")
      .select(
        col("q"),
        col("est"),
        coalesce(Quantiles.zipWithIndex.map { case (q, i) =>
          when(col("q") === q, col(s"x$i"))
        }: _*).as("exact_pct"))
      .withColumn("err_ok", abs(col("est") - col("exact_pct")) <= lit(Tolerance))
      .orderBy(col("q"))
  }

  /** One-shot sketch + certificate over `events.value`. */
  def quantileCertify(events: DataFrame): DataFrame =
    serveQuantiles(binCounts(events, col("value")), events, "value")

  /** DuckDB replay over `events.value` — sketch, interpolation, exact
    * panel and certificate recomputed from raw rows. Quantile literals
    * are cast to DOUBLE so the output column types match Spark's.
    */
  def quantileSketchSql: String = {
    val qsList = Quantiles.map(q => s"$q::DOUBLE").mkString(", ")
    val est =
      s"""round(CAST(hp.bin AS DOUBLE) * $Width +
         |             $Width * (hp.q * CAST(hp.n AS DOUBLE) - CAST(hp.prev AS DOUBLE)) / CAST(hp.cnt AS DOUBLE),
         |             6)""".stripMargin
    val exactCase =
      s"CASE ${Quantiles.zipWithIndex.map { case (q, i) => s"WHEN hp.q = $q THEN e.x$i" }.mkString(" ")} END"
    s"""WITH c AS (
       |  SELECT CASE WHEN value < 0.0 THEN -1
       |              WHEN value >= $DomainHi THEN $Bins
       |              ELSE CAST(floor(value / $Width) AS BIGINT) END AS bin,
       |         count(*) AS cnt
       |  FROM events GROUP BY 1),
       |p AS (
       |  SELECT bin, cnt,
       |         sum(cnt) OVER (ORDER BY bin) AS cum,
       |         sum(cnt) OVER () AS n,
       |         sum(cnt) OVER (ORDER BY bin) - cnt AS prev
       |  FROM c),
       |qs AS (SELECT unnest([$qsList]) AS q),
       |hit AS (
       |  SELECT q, min(bin) AS bin
       |  FROM qs JOIN p ON p.cum >= q * p.n
       |  GROUP BY q),
       |hp AS (
       |  SELECT hit.q, hit.bin, p.prev, p.cnt, p.n
       |  FROM hit JOIN p ON p.bin = hit.bin),
       |e AS (SELECT ${Quantiles.zipWithIndex.map { case (q, i) =>
              s"round(quantile_cont(value, $q), 6) AS x$i" }.mkString(", ")}
       |      FROM events)
       |SELECT hp.q AS q,
       |       $est AS est,
       |       round($exactCase, 6) AS exact_pct,
       |       abs($est - round($exactCase, 6)) <= $Tolerance AS err_ok
       |FROM hp, e
       |ORDER BY q""".stripMargin
  }
}
