package graft

import java.nio.file.Files

import graft.operators.ViewBuilder
import graft.sources.SensorGrid
import graft.streaming.StreamingViews
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Stream==batch equivalence for the view builder (SURVEY §5.4),
  * including out-of-order (late) input: without a watermark, late rows
  * must still merge into their (geo, window) cell — the reference's
  * KTable semantics (IngestStream.java:372-394).
  */
class StreamingSpec extends AnyFunSuite {
  import SparkTestBase._

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.select(
      col("metric"),
      col("geo"),
      col("ts").cast("long").as("ts_s"),
      col("cnt"),
      round(col("sum_val"), 6).as("sum_val"))
      .collect()
      .map(_.toSeq)
      .sortBy(_.mkString("|"))

  test("AvailableNow streaming view == batch view (sf0.001, minute)") {
    val streamed = StreamingViews.runAvailableNow(spark, Sf0001, "min", 6)
    val batch = ViewBuilder.build(
      SensorGrid.readings(spark, Sf0001),
      substring(col("gh12"), 1, 6),
      "min")
    assert(normalize(streamed).sameElements(normalize(batch)))
  }

  test("late data merges into existing windows (two files, no watermark)") {
    val tmp = Files.createTempDirectory("graft-stream").toFile.getAbsolutePath
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$Sf0001/events.parquet") // ts stays nanos-long
    val median = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    val evDir = s"$tmp/events.parquet"
    // recent half arrives first; older (late) half arrives in a second file
    raw.filter(col("ts") >= median).coalesce(1).write.mode("append").parquet(evDir)
    raw.filter(col("ts") < median).coalesce(1).write.mode("append").parquet(evDir)

    val name = "stream_late_view"
    val q = StreamingViews
      .viewStream(spark, tmp, "hour", 6, maxFilesPerTrigger = Some(1)) // force ≥2 micro-batches
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 2, "late file must arrive in a later micro-batch")

    val batch = ViewBuilder.build(
      SensorGrid.readings(spark, Sf0001),
      substring(col("gh12"), 1, 6),
      "hour")
    assert(normalize(spark.table(name)).sameElements(normalize(batch)))
  }

  test("watermark opt-in (production divergence): too-late data is dropped, not merged") {
    val tmp = Files.createTempDirectory("graft-wm").toFile.getAbsolutePath
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$Sf0001/events.parquet")
    val median = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    val evDir = s"$tmp/events.parquet"
    val recent = raw.filter(col("ts") >= median)
    // three files with distinct mtimes → three micro-batches (oldest-mtime
    // first). The late-event filter runs with the PREVIOUS batch's
    // watermark (Spark lags it one batch by design), so the watermark
    // advanced by batch 0 only starts dropping in batch 2.
    recent.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(evDir)
    Thread.sleep(1500)
    recent.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(evDir)
    Thread.sleep(1500)
    raw.filter(col("ts") < median).coalesce(1).write.mode("append").parquet(evDir) // days late

    val q = StreamingViews
      .viewStream(spark, tmp, "hour", 6, watermark = Some("1 minute"), maxFilesPerTrigger = Some(1))
      .writeStream
      .format("memory")
      .queryName("stream_wm_view")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 3)
    // every emitted window is from the recent half: the late file's
    // windows (weeks behind the watermark) never surface
    val minEmitted = spark.table("stream_wm_view")
      .agg(min(col("ts").cast("long"))).head.getLong(0)
    val medianSec = median / 1000000000L
    assert(minEmitted >= medianSec - 3600,
      s"late windows leaked through the watermark: $minEmitted < ~$medianSec")
  }

  test("materializeViews writes a partitioned, re-readable view table") {
    val tmp = Files.createTempDirectory("graft-mat").toFile.getAbsolutePath
    StreamingViews.materializeViews(spark, Sf0001, s"$tmp/out", "day", 6, s"$tmp/ckpt")
    val written = spark.read.parquet(s"$tmp/out")
    val batch = ViewBuilder.build(
      SensorGrid.readings(spark, Sf0001),
      substring(col("gh12"), 1, 6),
      "day")
    assert(written.count() === batch.count())
    // partition pruning works on the sink layout
    val pruned = written.filter(col("metric") === "click")
    assert(pruned.count() === batch.filter(col("metric") === "click").count())
  }
}
