package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The EXPLORA materialized-view builder: continuous spatio-temporal
  * pre-aggregation of readings into (metric, geo, ts) cells carrying the
  * mergeable summary (count, sum, avg).
  *
  * Behavioral reference: ingestion/IngestStream.java:302-397 (the
  * per-metric × per-precision × 4-resolution KTable loop) with the
  * aggregation step at IngestStream.java:84-92 and the merge algebra at
  * util/Aggregator.java:18-32 (avg is ALWAYS Σsum/Σcount, never an
  * average of averages).
  *
  * Spark-first shape: the reference's 16-branch topology (one
  * repartition topic per branch) collapses into ONE `groupBy` per
  * resolution with `metric` as a grouping column — a single shuffle per
  * resolution regardless of metric count. Partial aggregation
  * (map-side combine in HashAggregateExec) replaces the reference's
  * scatter-gather partial-merge RPC; at 1000 executors the shuffle
  * carries only (cells × metrics) pre-combined rows, not raw readings.
  */
object ViewBuilder {

  /** Reference resolution name → Spark/ANSI date_trunc unit
    * (ingestion truncation at IngestStream.java:310-362; month is
    * calendar month, not a fixed 30-day window).
    */
  val Resolutions: Map[String, String] = Map(
    "min" -> "minute",
    "hour" -> "hour",
    "day" -> "day",
    "month" -> "month")

  /** Build one materialized view: `geo` is the spatial key column
    * (geohash prefix or quadkey — SURVEY §2.2 P5/P8), `resolution` one
    * of min/hour/day/month. Output schema:
    * (metric, geo, ts, cnt, sum_val, avg_val) — the ViewRow of
    * FIXTURES.md §A2 with unrounded doubles (rounding happens only at
    * presentation).
    */
  def build(readings: DataFrame, geo: Column, resolution: String): DataFrame = {
    val unit = Resolutions.getOrElse(resolution, resolution)
    readings
      .groupBy(
        col("metric"),
        geo.as("geo"),
        date_trunc(unit, col("ts")).as("ts"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_val"))
      .withColumn("avg_val", col("sum_val") / col("cnt"))
  }
}
