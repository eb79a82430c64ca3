package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the EXPLORA minute views: gap-fill a
  * sparse (geo, minute) series onto a dense per-cell minute grid with
  * forward-fill — the resample/interpolate step a sensor-analytics or
  * feature-engineering pipeline runs between the materialized view and
  * a model (the reference serves the SPARSE series as-is,
  * querying/QueryingController.java:219-229; densification is left to
  * its clients).
  *
  * Scale shape: the grid is generated PER KEY from that key's own
  * [min, max] bounds (`sequence` + `explode` inside the row — no
  * driver-side range, no cross join), the observation join is an
  * equi-join on (geo, ts_s), and the forward-fill is one
  * `last(ignoreNulls)` running window per key — at 100 TB each key's
  * grid stays bounded by its own span/step and the whole plan shuffles
  * on geo only.
  */
object TimeSeries {

  /** Forward-fill the minute view for `metric` over `geos` within
    * [fromS, toS): output one row per (geo, minute-in-span) with the
    * last observed `avg_val` carried forward and an `observed` marker.
    * Each key's grid starts at its own first observation, so `filled`
    * is never null.
    */
  def gapFillMinutes(
      minuteView: DataFrame,
      metric: String,
      geos: Seq[String],
      fromS: Long,
      toS: Long): DataFrame = {
    val obs = minuteView
      .filter(col("metric") === metric && col("geo").isin(geos: _*))
      .select(col("geo"), col("ts").cast("long").as("ts_s"), col("avg_val"))
      .filter(col("ts_s") >= fromS && col("ts_s") < toS)
    val grid = obs
      .groupBy(col("geo"))
      .agg(min(col("ts_s")).as("mn"), max(col("ts_s")).as("mx"))
      .select(col("geo"), explode(sequence(col("mn"), col("mx"), lit(60L))).as("ts_s"))
    val w = Window
      .partitionBy(col("geo"))
      .orderBy(col("ts_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs, Seq("geo", "ts_s"), "left")
      .withColumn("filled", round(last(col("avg_val"), ignoreNulls = true).over(w), 6))
      .withColumn("observed", when(col("avg_val").isNotNull, lit(1)).otherwise(lit(0)))
      .select(col("geo"), col("ts_s"), col("filled"), col("observed"))
      .orderBy(col("geo"), col("ts_s"))
  }

  /** Trailing moving average over the minute view via a RANGE frame on
    * epoch seconds: each row averages the last `windowSec` of REAL
    * readings — Σsum/Σcnt over the frame (the mergeable-summary
    * algebra again: never an average of the per-minute averages, which
    * would weight sparse minutes equally with dense ones). A RANGE
    * frame (not ROWS) is what makes this correct on a sparse series —
    * gaps shrink the frame instead of stretching it over old data.
    * One WindowExec per key; both frame aggregates share it.
    */
  def movingAvgMinutes(
      minuteView: DataFrame,
      metric: String,
      geos: Seq[String],
      windowSec: Long = 3600L): DataFrame = {
    require(
      windowSec >= 60 && windowSec % 60 == 0,
      s"windowSec must be a positive multiple of the 60 s grid (got $windowSec)")
    val obs = minuteView
      .filter(col("metric") === metric && col("geo").isin(geos: _*))
      .select(col("geo"), col("ts").cast("long").as("ts_s"), col("cnt"), col("sum_val"))
    val w = Window
      .partitionBy(col("geo"))
      .orderBy(col("ts_s"))
      .rangeBetween(-(windowSec - 60), 0)
    obs
      .withColumn("ma", round(sum(col("sum_val")).over(w) / sum(col("cnt")).over(w), 6))
      .select(col("geo"), col("ts_s"), col("cnt"), round(col("sum_val"), 6).as("sum_val"), col("ma"))
      .orderBy(col("geo"), col("ts_s"))
  }
}
