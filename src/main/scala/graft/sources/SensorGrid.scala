package graft.sources

import graft.functions.GeoFunctions
import graft.geo.{GeoHash, QuadKey}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic mapping of the driver's `events` table onto the
  * reference's air-quality reading model (FIXTURES.md §B):
  * `event_type` = metricId, `ts` = event time, `value` = reading value,
  * and a synthetic sensor location derived from `user_id` — a 10×5 grid
  * of sensors inside the Antwerp probe bbox the reference's load script
  * queries (sim_api_load.sh).
  *
  * The sensor table is a tiny dimension joined with `broadcast()` —
  * the 100 TB-correct shape for enriching a fact stream with sensor
  * metadata (no shuffle of the fact side). The geo keys (full-precision
  * geohash + zoom-14 quadkey, matching the reference's two geo-indexing
  * modes: ingestion/IngestStream.java:308-370) are then derived
  * per-record by the codegen'd Catalyst expressions.
  */
object SensorGrid {

  val NumCells = 50
  val GhPrecision = 12 // full-precision geohash carried by each reading
  val QuadZoom = 14    // reference production zoom (kubernetes ConfigMap PRECISION: '14')

  final case class Sensor(cell: Int, lat: Double, lon: Double)

  /** 10 rows (lat) × 5 cols (lon) inside the Antwerp probe bbox
    * (51.17..51.31, 4.31..4.50).
    */
  val sensors: Seq[Sensor] = (0 until NumCells).map { c =>
    Sensor(c, 51.18 + (c % 10) * 0.012, 4.32 + (c / 10) * 0.035)
  }

  /** Driver-side geo keys per cell, from the same pure kernel the
    * Catalyst expressions call — used to generate the DuckDB oracle's
    * literal geo map so both sides agree bit-for-bit.
    */
  val cellGeo: Seq[(Int, String, String)] = sensors.map { s =>
    (s.cell, GeoHash.encode(s.lat, s.lon, GhPrecision), QuadKey.quadKey(s.lat, s.lon, QuadZoom))
  }

  /** Expected result of re-indexing each cell's geohash into a quadkey
    * via the CELL-CENTER decode (the reference's per-record hot path,
    * ingestion/IngestStream.java:313-316: decodeHash → tile → quadkey)
    * — the oracle literals for the fused `geohash_to_quadkey`
    * expression.
    */
  val cellReindexed: Seq[(String, String)] = cellGeo.map { case (_, gh, _) =>
    val (lat, lon) = GeoHash.decode(gh)
    (gh, QuadKey.quadKey(lat, lon, QuadZoom))
  }.distinct

  def sensorTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sensors.toDF()
  }

  /** events → readings: (metric, ts, value, gh12, qk14). */
  def readings(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .withColumn("cell", (col("user_id") % NumCells).cast("int"))
      .join(broadcast(sensorTable(spark)), "cell")
      .select(
        col("event_type").as("metric"),
        col("ts"),
        col("value"),
        GeoFunctions.geohash_encode(col("lat"), col("lon"), GhPrecision).as("gh12"),
        GeoFunctions.quadkey(col("lat"), col("lon"), QuadZoom).as("qk14"))

  /** DuckDB oracle prelude: the literal cell→geo map plus the readings
    * projection, shared by every EXPLORA oracle query.
    */
  def oracleReadingsCte: String = {
    val rows = cellGeo
      .map { case (c, gh, qk) => s"($c, '$gh', '$qk')" }
      .mkString(", ")
    s"""WITH geo_map(cell, gh12, qk14) AS (SELECT * FROM (VALUES $rows)),
       |readings AS (
       |  SELECT e.event_type AS metric, e.ts AS ts, e.value AS value,
       |         g.gh12 AS gh12, g.qk14 AS qk14
       |  FROM events e JOIN geo_map g ON (e.user_id % ${NumCells}) = g.cell
       |)""".stripMargin
  }
}
