package graft

import graft.operators.{QueryValidation, Sessionize}
import graft.sources.ReadingJson
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class SerdeAndValidationSpec extends AnyFunSuite {
  import SparkTestBase._

  // ---- ReadingJson (S2/S3/S4) ----------------------------------------

  test("from_json parses the reading schema and ignores unknown fields") {
    import spark.implicits._
    val rows = Seq(
      ("""{"metricId":"no2","timestamp":1704067200000,"sourceId":"a","geohash":"u155kp","value":21.5,"junk":{"x":1}}""", 99L))
      .toDF("json", "transport")
    val out = ReadingJson.parse(rows, col("json"), col("transport")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("metric") === "no2")
    assert(out.head.getAs[Double]("value") === 21.5)
    assert(out.head.getAs[java.sql.Timestamp]("ts").getTime === 1704067200000L)
  }

  test("TSExtractor semantics: null timestamp falls back to transport time; negative dropped") {
    import spark.implicits._
    val rows = Seq(
      ("""{"metricId":"a","value":1.0}""", 5000L), // no timestamp → transport
      ("""{"metricId":"b","timestamp":-42,"value":1.0}""", 5000L), // negative → drop
      ("""{"metricId":"c","timestamp":7000,"value":1.0}""", 5000L))
      .toDF("json", "transport")
    val out = ReadingJson.parse(rows, col("json"), col("transport"))
      .select("metric", "ts").collect().map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    assert(out === Map("a" -> 5000L, "c" -> 7000L))
  }

  test("serialize → parse round-trips the reading") {
    import spark.implicits._
    val src = Seq(("no2", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L)), 21.5, "u155kp", "s1"))
      .toDF("metric", "ts", "value", "geohash", "sourceId")
    val json = ReadingJson.serialize(src)
    val back = ReadingJson.parse(json, col("json"), lit(0L)).collect().head
    assert(back.getAs[String]("metric") === "no2")
    assert(back.getAs[Double]("value") === 21.5)
    assert(back.getAs[String]("geohash") === "u155kp")
    assert(back.getAs[java.sql.Timestamp]("ts").getTime === 1704067200000L)
  }

  // ---- QueryValidation (P12) -----------------------------------------

  test("history validation mirrors QueryingService checks") {
    val ok = () => QueryValidation.validateHistory(
      Seq("u155kp"), 6, "avg", Some("min"), None, 0L, 100L, 1000L)
    ok()
    def bad(f: => Unit): String =
      intercept[IllegalArgumentException](f).getMessage
    assert(bad(QueryValidation.validateHistory(Nil, 6, "avg", Some("min"), None, 0, 1, 2))
      .contains("comma-separated geohash prefixes"))
    assert(bad(QueryValidation.validateHistory(Seq("u155"), 6, "avg", Some("min"), None, 0, 1, 2))
      .contains("length 6"))
    assert(bad(QueryValidation.validateHistory(Seq("u155kp"), 6, "median", Some("min"), None, 0, 1, 2))
      .contains("median"))
    // both given is LEGAL in the reference (if/else-if dispatch,
    // QueryingService.java:118-131): resolution wins, interval ignored
    QueryValidation.validateHistory(Seq("u155kp"), 6, "avg", Some("min"), Some("1day"), 0, 1, 2)
    assert(QueryValidation.historyBranch(Some("min"), Some("1day")) === Some(Left("min")))
    // an unusable resolution falls through to a usable interval
    assert(QueryValidation.historyBranch(Some("nope"), Some("1day")) === Some(Right("1day")))
    assert(bad(QueryValidation.validateHistory(Seq("u155kp"), 6, "avg", Some("nope"), Some("junk"), 0, 1, 2))
      .contains("Invalid values"))
    assert(bad(QueryValidation.validateHistory(Seq("u155kp"), 6, "avg", Some("min"), None, 5, 5, 9))
      .contains("less than toDate"))
    assert(bad(QueryValidation.validateHistory(Seq("u155kp"), 6, "avg", None, Some("2weeks"), 0, 1, 2))
      .contains("2weeks"))
  }

  test("snapshot validation mirrors QueryingService checks") {
    QueryValidation.validateSnapshot(1000L, 51.31, 4.31, 51.17, 4.50, 6, "avg", "min")
    def bad(f: => Unit): String = intercept[IllegalArgumentException](f).getMessage
    assert(bad(QueryValidation.validateSnapshot(1000L, 51.17, 4.31, 51.31, 4.50, 6, "avg", "min"))
      .contains("north"))
    assert(bad(QueryValidation.validateSnapshot(1000L, 51.31, 4.50, 51.17, 4.31, 6, "avg", "min"))
      .contains("east"))
    assert(bad(QueryValidation.validateSnapshot(1000L, 51.31, 4.31, 51.17, 4.50, 3, "avg", "min"))
      .contains("geohash precision 3 is not yet supported"))
    assert(bad(QueryValidation.validateSnapshot(-5L, 51.31, 4.31, 51.17, 4.50, 6, "avg", "min"))
      .contains("valid timestamp in milliseconds"))
  }

  // ---- streaming serde (S1/S4/S7 shape minus the Kafka connector) ----
  //
  // The production source is readStream.format("kafka") → value bytes →
  // ReadingJson.parse with the record timestamp as transport fallback.
  // The connector jar isn't in this container, so the closest closable
  // surface is a MemoryStream of (payload, transportTs) driven through
  // the SAME parse plan — proving the serde + TSExtractor semantics
  // (null-ts fallback, negative drop, corrupt-payload drop) hold under
  // incremental streaming execution, not just batch.

  test("streaming parse: corrupt dropped, null ts takes transport fallback, negative dropped") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val parsed = ReadingJson.parse(mem.toDF().toDF("json", "transport"), col("json"), col("transport"))
    val q = parsed.writeStream
      .format("memory").queryName("stream_serde").outputMode("append").start()
    mem.addData(
      ("""{"metricId":"ok","timestamp":7000,"sourceId":"s1","value":1.5}""", 5000L),
      ("""{"metricId":"fallback","value":2.0,"junk":[1,2]}""", 5000L), // null ts → transport
      ("""{"metricId":"neg","timestamp":-42,"value":3.0}""", 5000L), // negative → drop
      ("""this is { not json""", 5000L)) // corrupt → drop
    q.processAllAvailable()
    // second micro-batch: the fallback keeps working incrementally
    mem.addData(("""{"metricId":"fallback2","value":4.0}""", 9000L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("stream_serde")
      .select("metric", "ts").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    assert(out === Map("ok" -> 7000L, "fallback" -> 5000L, "fallback2" -> 9000L))
  }

  // ---- streaming sessionization (custom state) -----------------------

  test("flatMapGroupsWithState session stats stay cumulative across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = graft.sources.Tables.load(spark, Sf0001, "events")
      .select(col("user_id").cast("long"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val median = events.map(_._2).sorted.apply(events.length / 2)
    val mem = MemoryStream[(Long, Long)]
    val q = Sessionize.streamingUserStats(mem.toDF().toDF("user_id", "ts"), 1800).writeStream
      .format("memory").queryName("stream_sessions_mb").outputMode("update").start()
    // event-time order across batches (per user too), so incremental
    // session state must reproduce the one-shot batch answer
    mem.addData(events.filter(_._2 < median).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(events.filter(_._2 >= median).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    // update mode appends every re-emission; stats are monotone, so the
    // final value per user is the max
    val streamed = spark.table("stream_sessions_mb")
      .groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = Sessionize.userStats(graft.sources.Tables.load(spark, Sf0001, "events"), 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.sameElements(batch))
  }

  test("flatMapGroupsWithState session counts == batch window sessionization") {
    val events = graft.sources.Tables.load(spark, Sf0001, "events")
    val batch = Sessionize.userStats(events, 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    val schema = graft.sources.Tables.streamSchema(spark, s"$Sf0001/events.parquet")
    val stream = graft.sources.Tables.normalizeTimestamps(
      spark.readStream.schema(schema).parquet(s"$Sf0001/{events.parquet}"), "events")
    val q = Sessionize.streamingUserStats(stream, 1800).writeStream
      .format("memory").queryName("stream_sessions").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("stream_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.sameElements(batch))
  }
}
