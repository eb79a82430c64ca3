package graft

import graft.operators.{TimeSeries, ViewBuilder}
import graft.sources.{SensorGrid, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: single-pass GROUPING SETS multi-resolution view,
  * time-series forward-fill, and session_window sessionization.
  */
class MultiResFillSessionsSpec extends AnyFunSuite {
  import SparkTestBase._

  private lazy val readings = SensorGrid.readings(spark, Sf0001).cache()

  private def viewRows(df: DataFrame) =
    df.select(
      col("metric"),
      col("geo"),
      col("ts").cast("long"),
      col("cnt"),
      round(col("sum_val"), 6))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("buildMultiRes slices == the three direct per-resolution builds") {
    val multi = ViewBuilder.buildMultiRes(readings, substring(col("gh12"), 1, 6)).cache()
    for (res <- Seq("min", "hour", "day")) {
      val slice = multi.filter(col("res") === res).drop("res")
      val direct = ViewBuilder.build(readings, substring(col("gh12"), 1, 6), res)
      assert(viewRows(slice).sameElements(viewRows(direct)), s"resolution $res diverged")
    }
    multi.unpersist()
  }

  test("buildMultiRes pays exactly ONE shuffle for all three resolutions") {
    val multi = ViewBuilder.buildMultiRes(readings, substring(col("gh12"), 1, 6))
    val plan = multi.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected a single Exchange (Expand → partial → final agg), got $exchanges in:\n$plan")
    assert(plan.contains("Expand"), s"expected an Expand for the grouping sets in:\n$plan")
  }

  test("gapFillMinutes: dense per-key grid, forward-filled, never null") {
    val view = ViewBuilder.build(readings, substring(col("gh12"), 1, 6), "min")
    val geos = SensorGrid.cellGeo.map(_._2.substring(0, 6)).distinct.sorted.take(3)
    val from = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val to = java.time.Instant.parse("2024-02-01T00:00:00Z").getEpochSecond
    val filled = TimeSeries.gapFillMinutes(view, "click", geos, from, to).cache()
    // grid density: per key, exactly (mx-mn)/60 + 1 rows, all distinct
    val bounds = filled.groupBy(col("geo"))
      .agg(min(col("ts_s")).as("mn"), max(col("ts_s")).as("mx"), count(lit(1)).as("n"))
      .collect()
    assert(bounds.nonEmpty)
    bounds.foreach { r =>
      assert(r.getLong(3) === (r.getLong(2) - r.getLong(1)) / 60 + 1,
        s"grid for ${r.getString(0)} is not dense")
    }
    assert(filled.filter(col("filled").isNull).count() === 0)
    // observed rows reproduce the view exactly; gap rows carry the most
    // recent earlier observation
    val obs = view
      .filter(col("metric") === "click" && col("geo").isin(geos: _*))
      .select(col("geo"), col("ts").cast("long").as("ts_s"),
        round(col("avg_val"), 6).as("v"))
      .filter(col("ts_s") >= from && col("ts_s") < to)
    val joined = filled.join(obs, Seq("geo", "ts_s"), "left").cache()
    assert(joined.filter(col("observed") === 1 && col("filled") =!= col("v")).count() === 0)
    val w = Window.partitionBy(col("geo")).orderBy(col("ts_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val refFill = joined.withColumn("ref", last(col("v"), ignoreNulls = true).over(w))
    assert(refFill.filter(col("filled") =!= col("ref")).count() === 0)
    joined.unpersist(); filled.unpersist()
  }

  test("movingAvgMinutes: RANGE frame == per-row brute-force over the trailing hour") {
    val view = ViewBuilder.build(readings, substring(col("gh12"), 1, 6), "min")
    val geos = SensorGrid.cellGeo.map(_._2.substring(0, 6)).distinct.sorted.take(3)
    val ma = graft.operators.TimeSeries.movingAvgMinutes(view, "view", geos).collect()
    assert(ma.nonEmpty)
    val obs = view
      .filter(col("metric") === "view" && col("geo").isin(geos: _*))
      .select(col("geo"), col("ts").cast("long"), col("cnt"), col("sum_val"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    ma.foreach { r =>
      val (geo, ts) = (r.getString(0), r.getLong(1))
      val frame = obs.filter(o => o._1 == geo && o._2 >= ts - 3540 && o._2 <= ts)
      val expect = frame.map(_._4).sum / frame.map(_._3).sum
      assert(math.abs(r.getDouble(4) - expect) < 1e-6, s"($geo, $ts)")
    }
  }

  test("qualityCalibration: within-source percentile ranks, deterministic and monotone") {
    val docs = Tables.load(spark, Sf0001, "documents")
    val cal = graft.operators.TextAnalysis.qualityCalibration(docs).collect()
    assert(cal.nonEmpty)
    cal.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val sorted = rows.sortBy(r => (r.getDouble(2), r.getLong(0)))
      // percent_rank: 0 for the first, (i)/(n-1) thereafter, monotone
      assert(sorted.head.getDouble(3) === 0.0, src)
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p(0) <= p(1)), src)
      if (rows.length > 1)
        assert(math.abs(sorted.last.getDouble(3) - 1.0) < 1e-9, src)
    }
  }

  test("stream-stream join == batch self-join (same-user purchase within window)") {
    val streamed = graft.streaming.StreamingViews
      .runStreamStreamJoinAvailableNow(spark, Sf0001, 3600L)
    val e = Tables.load(spark, Sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts").cast("long").as("t"))
    val batch = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("t").as("ct"))
      .join(
        e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("t").as("pt")),
        col("user_id") === col("pu") && col("pt") >= col("ct") && col("pt") < col("ct") + 3600L)
      .select(col("user_id"), col("click_id"), col("purchase_id"), (col("pt") - col("ct")).as("lag_s"))
    val key = (df: DataFrame) => df.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(streamed.count() > 0)
    assert(key(streamed).sameElements(key(batch)))
  }

  test("streaming session_window == batch lag rule with the > gap break") {
    val sessions = graft.streaming.StreamingViews
      .runSessionsAvailableNow(spark, Sf0001, 1800L).cache()
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_s"), col("event_id"))
    val batch = Tables.load(spark, Sf0001, "events")
      .select(col("user_id"), col("event_id"), col("value"), col("ts").cast("long").as("ts_s"))
      .withColumn("prev", lag(col("ts_s"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("ts_s") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("sid",
        sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_s")).as("sess_start_s"), count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .drop("sid")
    val key = (df: DataFrame) =>
      df.select(col("user_id"), col("sess_start_s"), col("n_events"), col("sum_value"))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(sessions.count() > 0)
    assert(key(sessions).sameElements(key(batch)))
    sessions.unpersist()
  }
}
