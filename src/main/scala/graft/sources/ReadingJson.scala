package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON serde for the reference's reading records (SURVEY §2.1 S2/S3,
  * §1.2): the Jackson POJO round-trip
  * (util/serdes/JsonPOJODeserializer.java:43-56 /
  * JsonPOJOSerializer.java:40-49) becomes `from_json`/`to_json` with an
  * explicit schema; unknown JSON fields are ignored by from_json exactly
  * like `@JsonIgnoreProperties(ignoreUnknown = true)`
  * (model/AirQualityReading.java:5).
  *
  * Event-time extraction (S4) mirrors util/TSExtractor.java:11-22:
  * the embedded `timestamp` field is the event time, a null timestamp
  * falls back to the transport (Kafka record) time, and records whose
  * resolved time is negative are dropped (Kafka Streams discards
  * negative-timestamp records).
  */
object ReadingJson {

  /** model/AirQualityReading.java:7-15 (value is Object in Java but
    * always a double in practice — IngestStream.java:89).
    */
  val Schema: StructType = StructType(Seq(
    StructField("tsReceivedMs", LongType),
    StructField("metricId", StringType),
    StructField("timestamp", LongType),
    StructField("sourceId", StringType),
    StructField("geohash", StringType),
    StructField("h3Index", LongType),
    StructField("elevation", DoubleType),
    StructField("value", DoubleType),
    StructField("timeUnit", StringType)))

  /** Parse a JSON payload column into typed reading columns with
    * TSExtractor event-time semantics. `transportTsMs` is the fallback
    * record time (Kafka timestamp in production).
    */
  def parse(df: DataFrame, jsonCol: Column, transportTsMs: Column): DataFrame =
    df.withColumn("r", from_json(jsonCol, Schema))
      // corrupt payloads parse to a null/empty struct: drop them (the
      // reference's Jackson serde throws; streaming log-and-skip is the
      // production-sane equivalent)
      .filter(col("r").isNotNull && col("r.metricId").isNotNull)
      .withColumn("eventTimeMs", coalesce(col("r.timestamp"), transportTsMs))
      .filter(col("eventTimeMs") >= 0) // TSExtractor.java:17-21 discard path
      .select(
        col("r.metricId").as("metric"),
        timestamp_millis(col("eventTimeMs")).as("ts"),
        col("r.value").as("value"),
        col("r.geohash").as("geohash"),
        col("r.sourceId").as("sourceId"))

  /** Serialize typed reading columns back to the wire JSON (S3). */
  def serialize(df: DataFrame): DataFrame =
    df.withColumn(
      "json",
      to_json(struct(
        col("metric").as("metricId"),
        (col("ts").cast("long") * 1000).as("timestamp"),
        col("value"),
        col("geohash"),
        col("sourceId"))))
}
