package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-profiling operators: the data-quality pass every large-scale
  * pipeline runs before (and after) transformation — per-column
  * null/distinct/range statistics and value histograms. The reference
  * has no analogue (its schema is fixed at deploy time); these belong to
  * the training-data-pipeline surface.
  *
  * Scale notes: `dataProfile` is ONE multi-aggregate pass — Spark plans
  * the n-column count-distinct set via a single Expand (rows × n_cols)
  * feeding one partial+final hash aggregation; no per-column scans and
  * no joins. At 100 TB exact distinct on a high-cardinality column
  * shuffles every distinct key once (unavoidable for exactness; bytes =
  * distinct keys, not rows). When a bound is acceptable, swap
  * `count_distinct` for `approx_count_distinct` — fixed 16 KB of state
  * per column, certified within 5% on this very gate by
  * [[CorpusSignals.sketchCertify]]. `valueHistogram` is two aggregation
  * passes (global min/max, then bin counts) with the one-row bounds
  * frame broadcast — never collected to the driver.
  */
object Profiling {

  /** Per-column profile of the events table: null count, exact distinct
    * count, numeric min/max (NULL for non-numeric columns; timestamps
    * surface as epoch seconds). One row per column, one aggregation pass.
    */
  def dataProfile(events: DataFrame): DataFrame = {
    // numeric view of each profiled column (NULL where not castable)
    val numeric: Map[String, Column] = Map(
      "event_id" -> col("event_id").cast("double"),
      "user_id" -> col("user_id").cast("double"),
      "value" -> col("value"),
      "ts_s" -> col("ts").cast("long").cast("double"),
      "event_type" -> lit(null).cast("double"),
      "props" -> lit(null).cast("double"))
    val source: Map[String, Column] = Map(
      "event_id" -> col("event_id"),
      "user_id" -> col("user_id"),
      "value" -> col("value"),
      "ts_s" -> col("ts").cast("long"),
      "event_type" -> col("event_type"),
      "props" -> col("props"))
    val cols = source.keys.toSeq.sorted
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(source(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(source(c)).as(s"${c}__distinct"),
        round(min(numeric(c)), 6).as(s"${c}__min"),
        round(max(numeric(c)), 6).as(s"${c}__max"))
    }
    val one = events.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row to (column, stats) via stack — still one pass
    val stackArgs = cols
      .map(c => s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max")
      .mkString(", ")
    one
      .select(expr(
        s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct, min_num, max_num)"))
      .orderBy(col("column"))
  }

  /** DuckDB twin: one SELECT per column, UNION ALL (DuckDB plans each
    * leg off the same scan; at oracle scale that's fine — the Spark side
    * is the single-pass shape that matters at 100 TB).
    */
  val DataProfileSql: String = {
    def leg(c: String, sourceExpr: String, numExpr: String) =
      s"""SELECT '$c' AS "column",
         |  CAST(count(*) - count($sourceExpr) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $sourceExpr) AS BIGINT) AS n_distinct,
         |  round(CAST(min($numExpr) AS DOUBLE), 6) AS min_num,
         |  round(CAST(max($numExpr) AS DOUBLE), 6) AS max_num
         |FROM events""".stripMargin
    Seq(
      leg("event_id", "event_id", "event_id"),
      leg("event_type", "event_type", "NULL"),
      leg("props", "props", "NULL"),
      leg("ts_s", "epoch_ns(ts) // 1000000000", "epoch_ns(ts) // 1000000000"),
      leg("user_id", "user_id", "user_id"),
      leg("value", "value", "value")).mkString("", "\nUNION ALL\n", "\nORDER BY 1")
  }

  /** Number of fixed-width histogram bins. */
  val HistogramBins = 20

  /** Fixed-width histogram of `value` per event_type: global [min, max]
    * split into [[HistogramBins]] bins; the max value is clamped into the
    * last bin. Two aggregation passes; the one-row bounds frame joins via
    * broadcast (never `.collect()`), so the plan stays whole and lazy.
    *
    * Bin arithmetic is the identical IEEE expression tree on both
    * engines — `floor((value - lo) * nbins / (hi - lo))` — so boundary
    * assignment agrees bit-for-bit.
    */
  def valueHistogram(events: DataFrame, bins: Int = HistogramBins): DataFrame = {
    // one-row bounds joined on a non-foldable constant-1 key:
    // BroadcastHashJoin, never a nested-loop (PlanAuditSpec kill
    // criterion; a foldable key constant-folds back into one)
    val bounds = events
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .withColumn("one", CorpusSignals.one(col("lo")))
    events
      .withColumn("one", CorpusSignals.one(col("value")))
      .join(broadcast(bounds), "one")
      .drop("one")
      .withColumn(
        "bin",
        // hi == lo (constant column) must be guarded in BOTH dialects:
        // the unguarded expression is 0/0 = NaN, and the engines then
        // DIVERGE — Spark's floor(double)→long maps NaN to 0 while
        // DuckDB keeps floor(nan)=nan, which `least` treats as greater
        // (NaN orders last) and casts to bins-1
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(
            floor((col("value") - col("lo")) * lit(bins) / (col("hi") - col("lo"))),
            lit(bins - 1L)).cast("long")))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"), col("bin"))
  }

  def valueHistogramSql(bins: Int = HistogramBins): String =
    s"""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
       |SELECT event_type,
       |       CASE WHEN hi = lo THEN 0
       |            ELSE CAST(least(floor((value - lo) * $bins / (hi - lo)), ${bins - 1}) AS BIGINT)
       |       END AS bin,
       |       count(*) AS cnt
       |FROM events CROSS JOIN b
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** |z| threshold for [[valueAnomalies]]. */
  val AnomalyZ = 2.5

  /** Per-metric z-score outlier detection over `events`: readings whose
    * value sits more than [[AnomalyZ]] sample standard deviations from
    * their metric's mean. The data-quality sweep a pipeline runs before
    * trusting a new batch — sensor spikes, unit mix-ups, stuck values.
    *
    * Plan shape: ONE hash aggregation computes per-metric (mean, stddev)
    * — the metric dimension is tiny at any corpus size, so the stats
    * frame broadcast-joins back onto the stream and the filter runs
    * inside the scan's codegen stage. Never a self-join, never a window
    * over the full table; at 100 TB this is scan + broadcast + scan cost.
    *
    * Single-member metrics (stddev undefined, NULL) and zero-variance
    * metrics (sigma = 0) produce no outliers in either engine: NULL and
    * div-by-zero-NULL comparisons are false under ANSI Spark and DuckDB
    * alike (DuckDB x/0.0 = inf for x>0, but value-mu = 0 there, and
    * 0/0.0 is NaN which fails the > comparison — same net no-row).
    */
  def valueAnomalies(events: DataFrame, zThreshold: Double = AnomalyZ): DataFrame =
    valueAnomaliesAgainst(events, metricStats(events), zThreshold)
      .orderBy(col("event_id"))

  /** Per-metric (mean, sample stddev) — the reference-distribution table
    * the anomaly filter scores against.
    */
  def metricStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sigma"))

  /** [[valueAnomalies]] scored against an EXTERNAL stats table, without
    * the presentation sort — a pure stateless projection + broadcast
    * join, legal on a STREAMING events frame (append mode, no state):
    * the production shape where yesterday's batch stats score today's
    * stream.
    */
  def valueAnomaliesAgainst(
      events: DataFrame,
      stats: DataFrame,
      zThreshold: Double = AnomalyZ): DataFrame =
    events
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mu")) / nullif(col("sigma"), lit(0.0)))
      .filter(abs(col("z")) > lit(zThreshold))
      .select(
        col("event_id"),
        col("event_type"),
        round(col("value"), 6).as("value"),
        round(col("z"), 6).as("z"))

  /** Quartile-bucket report per metric: the interpolated p25/p50/p75
    * thresholds (rounded to the output precision BEFORE bucketing, so
    * both engines compare against identical boundaries), then each
    * reading bucketed 1-4 by threshold comparison and summarized.
    *
    * This is the shuffle-correct formulation of NTILE-style bucketing:
    * a per-metric `ntile(4)` window would sort every reading of a
    * metric inside ONE partition (the whole table for a hot metric);
    * here the thresholds come from a percentile aggregate and the
    * bucket assignment is a broadcast join + CASE inside the scan's
    * codegen — no WindowExec anywhere.
    *
    * Memory caveat at extreme scale: Spark's EXACT `percentile` buffers
    * each metric's distinct values in its aggregation buffer — fine for
    * bounded-cardinality sensor values, but a continuous-valued hot
    * metric at 100 TB wants `approx_percentile` here (same plan shape;
    * `sketch_certify` certifies that sketch's error bound against the
    * exact answer). The gate pins the exact form because the DuckDB
    * oracle's `quantile_cont` is exact.
    */
  def valueQuartiles(events: DataFrame): DataFrame = {
    val thr = events
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 6).as("q1"),
        round(expr("percentile(value, 0.5)"), 6).as("q2"),
        round(expr("percentile(value, 0.75)"), 6).as("q3"))
    events
      .join(broadcast(thr), "event_type")
      .withColumn(
        "bucket",
        when(col("value") <= col("q1"), 1)
          .when(col("value") <= col("q2"), 2)
          .when(col("value") <= col("q3"), 3)
          .otherwise(4))
      .groupBy(col("event_type"), col("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        round(min(col("value")), 6).as("lo"),
        round(max(col("value")), 6).as("hi"))
      .orderBy(col("event_type"), col("bucket"))
  }

  val ValueQuartilesSql: String =
    """WITH thr AS (
      |  SELECT event_type,
      |         round(quantile_cont(value, 0.25), 6) AS q1,
      |         round(quantile_cont(value, 0.5), 6) AS q2,
      |         round(quantile_cont(value, 0.75), 6) AS q3
      |  FROM events GROUP BY 1)
      |SELECT events.event_type,
      |       CASE WHEN value <= q1 THEN 1 WHEN value <= q2 THEN 2
      |            WHEN value <= q3 THEN 3 ELSE 4 END AS bucket,
      |       count(*) AS cnt, round(min(value), 6) AS lo, round(max(value), 6) AS hi
      |FROM events JOIN thr USING (event_type)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** |z| threshold for [[rateAnomalies]] (rate spikes are judged against
    * a stricter bound than value outliers — minute counts are discrete
    * and Poisson-ish, so 3σ is the conventional spike line).
    */
  val RateZ = 3.0

  /** Per-minute event-RATE spike detection: minutes whose event count
    * sits more than [[RateZ]] sample standard deviations from that
    * metric's per-minute mean — the traffic-anomaly sweep (ingest gaps,
    * replay storms, runaway producers) next to [[valueAnomalies]]'
    * value-level sweep.
    *
    * Plan: one (metric, minute) hash agg over the stream (map-side
    * combinable; minutes-per-metric-sized output), one metric-sized
    * stats agg, broadcast back, filter. Counts stay integer through
    * both aggregations.
    */
  def rateAnomalies(events: DataFrame, zThreshold: Double = RateZ): DataFrame = {
    val perMin = events
      .groupBy(
        col("event_type"),
        date_trunc("minute", col("ts")).cast("long").as("minute_s"))
      .agg(count(lit(1)).as("c"))
    val stats = perMin
      .groupBy(col("event_type"))
      .agg(avg(col("c")).as("mu"), stddev_samp(col("c")).as("sigma"))
    perMin
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("c").cast("double") - col("mu")) / nullif(col("sigma"), lit(0.0)))
      .filter(abs(col("z")) > lit(zThreshold))
      .select(col("event_type"), col("minute_s"), col("c").as("n_events"), round(col("z"), 6).as("z"))
      .orderBy(col("event_type"), col("minute_s"))
  }

  def rateAnomaliesSql(zThreshold: Double = RateZ): String =
    s"""WITH pm AS (
       |  SELECT event_type, epoch_ns(date_trunc('minute', ts)) // 1000000000 AS minute_s,
       |         count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |s AS (SELECT event_type, avg(c) AS mu, stddev_samp(c) AS sigma
       |      FROM pm GROUP BY 1)
       |SELECT pm.event_type, minute_s, c AS n_events,
       |       round((CAST(c AS DOUBLE) - mu) / nullif(sigma, 0.0), 6) AS z
       |FROM pm JOIN s USING (event_type)
       |WHERE abs((CAST(c AS DOUBLE) - mu) / nullif(sigma, 0.0)) > $zThreshold
       |ORDER BY 1, 2""".stripMargin

  def valueAnomaliesSql(zThreshold: Double = AnomalyZ): String =
    s"""WITH s AS (
       |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
       |  FROM events GROUP BY 1)
       |SELECT event_id, events.event_type, round(value, 6) AS value,
       |       round((value - mu) / nullif(sigma, 0.0), 6) AS z
       |FROM events JOIN s USING (event_type)
       |WHERE abs((value - mu) / nullif(sigma, 0.0)) > $zThreshold
       |ORDER BY event_id""".stripMargin

  /** Trailing-window distinct actives (DAU + rolling `windowDays`-day
    * WAU) per day. SQL window frames cannot COUNT(DISTINCT) — the
    * scale-correct plan is a BOUNDED fan-out instead: dedup to
    * (user, day) pairs, explode each pair into the `windowDays` window
    * ends it contributes to (×windowDays rows, a constant factor —
    * never a day×user range join), and count distinct users per window
    * end. Phantom window ends past the last active day are dropped by a
    * broadcast semi-join against the real day list.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1 (got $windowDays)")
    val du = events
      .select(col("user_id"), date_trunc("day", col("ts")).cast("long").as("d"))
      .distinct()
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    // real-day list derives from dau (already day-grouped) — no third
    // distinct over the corpus-sized pair frame
    val days = dau.select(col("d").as("real_d"))
    val wau = du
      .select(
        col("user_id"),
        explode(sequence(col("d"), col("d") + lit(86400L * (windowDays - 1)), lit(86400L)))
          .as("wd"))
      .join(broadcast(days), col("wd") === col("real_d"), "left_semi")
      .groupBy(col("wd"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau
      .join(wau, col("d") === col("wd"))
      .select(col("d").as("day_s"), col("dau"), col("wau"))
      .orderBy(col("day_s"))
  }

  def rollingActiveUsersSql(windowDays: Int = 7): String = {
    val spanS = 86400L * (windowDays - 1)
    s"""WITH du AS (
       |  SELECT DISTINCT user_id,
       |         epoch_ns(date_trunc('day', ts)) // 1000000000 AS d
       |  FROM events),
       |days AS (SELECT DISTINCT d FROM du),
       |dau AS (SELECT d, count(*) AS dau FROM du GROUP BY 1),
       |wau AS (
       |  SELECT days.d, count(DISTINCT du.user_id) AS wau
       |  FROM days JOIN du ON du.d >= days.d - $spanS AND du.d <= days.d
       |  GROUP BY 1)
       |SELECT days.d AS day_s, dau.dau, wau.wau
       |FROM days JOIN dau ON days.d = dau.d JOIN wau ON days.d = wau.d
       |ORDER BY 1""".stripMargin
  }
}
