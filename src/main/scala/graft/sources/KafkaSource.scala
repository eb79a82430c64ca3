package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka ingestion wiring (SURVEY §2.1 S1/S7): the production source the
  * reference consumes from (ingestion/IngestStream.java:292, byte-array
  * keys + JSON values, `auto.offset.reset=earliest` at :238).
  *
  * `spark-sql-kafka` is not shipped in this container (zero egress), so
  * the `load()` call itself can only run in deployments that provide the
  * connector. Everything AROUND it is testable here and spec-asserted
  * (KafkaWiringSpec): [[options]] carries the exact option surface the
  * connector reads (subscribe topic, earliest offsets), [[fromRaw]] is
  * the full serde+event-time pipeline over the connector's fixed output
  * schema (value binary, timestamp) — exercised against both batch rows
  * and a MemoryStream under incremental execution — and [[readings]]
  * composes the two, so the ONLY untested surface is the provider
  * lookup inside Spark itself. The file source
  * (StreamingViews.readingsStream) is the environment's runnable
  * equivalent and produces the identical downstream plan.
  */
object KafkaSource {

  /** The connector option surface (S1 topic subscription + S7 earliest
    * offsets, like the reference's `auto.offset.reset`). Kept as data so
    * a spec can assert it without a provider lookup.
    */
  def options(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets)

  /** The serde + event-time stage over the connector's output schema:
    * value bytes → JSON → typed reading rows, with the TSExtractor
    * fallback to the Kafka record timestamp for null embedded times.
    * Works identically over a batch frame with the same columns — which
    * is exactly how the spec drives it.
    */
  def fromRaw(raw: DataFrame): DataFrame =
    ReadingJson.parse(
      raw,
      col("value").cast("string"),
      (col("timestamp").cast("double") * 1000).cast("long"))

  /** readings stream from a Kafka topic: the [[options]] surface wired
    * into `readStream.format("kafka")`, then [[fromRaw]].
    */
  def readings(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    fromRaw(
      spark.readStream
        .format("kafka")
        .options(options(bootstrapServers, topic, startingOffsets))
        .load())
}
