package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka ingestion wiring (SURVEY §2.1 S1/S7): the production source the
  * reference consumes from (ingestion/IngestStream.java:292, byte-array
  * keys + JSON values, `auto.offset.reset=earliest` at :238).
  *
  * `spark-sql-kafka` is not shipped in this container (zero egress), so
  * this path is compile-checked but exercised only in deployments that
  * provide the connector; the file source (StreamingViews.readingsStream)
  * is the environment's testable equivalent and produces the identical
  * downstream plan (JSON parse → TSExtractor semantics → view groupBy).
  */
object KafkaSource {

  /** readings stream from a Kafka topic: value bytes → JSON → typed
    * reading rows with TSExtractor event-time fallback to the Kafka
    * record timestamp.
    */
  def readings(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest"): DataFrame = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets) // S7: earliest, like the reference
      .load()
    ReadingJson.parse(
      raw,
      col("value").cast("string"),
      (col("timestamp").cast("double") * 1000).cast("long"))
  }
}
