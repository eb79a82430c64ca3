package graft

import graft.sources.KafkaSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S1/S7 wiring proof for the container without the Kafka connector jar
  * (SURVEY §8): everything around the provider lookup is exercised —
  * the exact option surface, the serde+event-time stage over the
  * connector's fixed output schema (batch AND incremental), and the
  * composed entry point failing ONLY at the provider lookup itself. A
  * deployment that adds `spark-sql-kafka` changes no graft code.
  */
class KafkaWiringSpec extends AnyFunSuite {
  import SparkTestBase._

  test("option surface: subscribe topic + earliest offsets, like the reference") {
    val o = KafkaSource.options("broker:9092", "readings")
    assert(o("kafka.bootstrap.servers") === "broker:9092")
    assert(o("subscribe") === "readings")
    assert(o("startingOffsets") === "earliest") // IngestStream.java:238 default
    assert(KafkaSource.options("b", "t", "latest")("startingOffsets") === "latest")
  }

  test("fromRaw over the connector output schema: value bytes parsed, record-ts fallback") {
    import spark.implicits._
    // the kafka source's fixed schema: we exercise exactly the columns
    // fromRaw reads (value binary, timestamp); extra columns ride along
    val rows = Seq(
      ("""{"metricId":"ok","timestamp":7000,"sourceId":"s1","value":1.5}""", 5L),
      ("""{"metricId":"fb","value":2.0}""", 5L), // null embedded ts → kafka record time
      ("""not json at all""", 5L)) // corrupt → dropped
      .toDF("v", "sec")
      .select(
        col("v").cast("binary").as("value"),
        timestamp_seconds(col("sec")).as("timestamp"),
        lit("readings").as("topic"))
    val out = KafkaSource.fromRaw(rows)
      .select("metric", "ts").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    assert(out === Map("ok" -> 7000L, "fb" -> 5000L))
  }

  test("fromRaw under incremental execution (MemoryStream standing in for the connector)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Array[Byte], Long)]
    val raw = mem.toDF()
      .select(col("_1").as("value"), timestamp_seconds(col("_2")).as("timestamp"))
    val q = KafkaSource.fromRaw(raw).writeStream
      .format("memory").queryName("kafka_wiring").outputMode("append").start()
    mem.addData(
      ("""{"metricId":"a","timestamp":1000,"value":1.0}""".getBytes("UTF-8"), 9L),
      ("""{"metricId":"b","value":2.0}""".getBytes("UTF-8"), 9L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("kafka_wiring")
      .select("metric", "ts").collect()
      .map(r => r.getString(0) -> r.getTimestamp(1).getTime).toMap
    assert(out === Map("a" -> 1000L, "b" -> 9000L))
  }

  /** Does Spark's data-source registry resolve "kafka" in this JVM?
    * True exactly when the connector jar is on the classpath.
    */
  private def kafkaProviderResolves: Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("kafka", spark.sessionState.conf)
      true
    } catch { case _: Throwable => false }

  test("readings() fails ONLY at the provider lookup in this container") {
    assume(!kafkaProviderResolves,
      "SKIPPED: connector present in this deployment — the live-path test below covers it")
    // proves the composed wiring reaches Spark's data-source resolution:
    // the one remaining untestable surface here is the connector jar
    // itself, not any graft code
    val e = intercept[Exception](
      KafkaSource.readings(spark, "broker:9092", "readings"))
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected a missing-kafka-provider error, got: ${e.getMessage.take(200)}")
  }

  test("LIVE kafka path: readings() lights up with ZERO code change when the connector resolves") {
    // Risk-register closure probe (VERDICT r8 #7). The exact dependency
    // this sandbox lacks is org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2
    // (plus its transitive kafka-clients) — drop those jars on the
    // classpath and this test arms itself; until then it reports
    // canceled (SKIPPED) with that coordinate, never silently green.
    assume(kafkaProviderResolves,
      "SKIPPED: kafka provider absent — needs org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 on the classpath (zero-egress sandbox has no connector jar)")
    // provider resolves: the composed source must now analyze as a
    // streaming frame with the post-serde reading schema — the exact
    // surface KafkaWiringSpec could previously only prove AROUND
    val df = KafkaSource.readings(spark, "broker:9092", "readings")
    assert(df.isStreaming)
    assert(df.columns.toSeq === Seq("metric", "ts", "value", "geohash", "sourceId"))
    // full end-to-end (broker required) is opt-in via env: set
    // SPARK_GRAFT_KAFKA_BOOTSTRAP (+ optional SPARK_GRAFT_KAFKA_TOPIC)
    // to point at a live broker carrying reading JSON and the query
    // must deliver parsed rows through the identical downstream plan
    sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP").foreach { bs =>
      val topic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "readings")
      val q = KafkaSource.readings(spark, bs, topic)
        .writeStream.format("memory").queryName("kafka_live")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(spark.table("kafka_live").count() > 0,
        s"connector resolved and broker $bs reachable but no rows arrived on '$topic'")
    }
  }
}
