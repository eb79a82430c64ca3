package graft.api

import java.time.Instant

import graft.geo.{GeoHash, QuadKey}
import graft.operators.{ExploraQueries, QueryValidation, ViewBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's query-service surface as a library API: the same
  * parameters and routing as the REST facade
  * (querying/QueryingService.java — history :38-135, snapshot
  * :137-230), minus HTTP. A serving layer maps routes onto these two
  * methods 1:1; every branch the reference routes on (resolution vs
  * interval, src=tiles vs raw, geohashing vs quadtiling) is here.
  *
  * Views are built once per (geoIndex, precision, resolution) and
  * persisted — the in-process analogue of the reference's RocksDB
  * stores; scatter-gather/metadata/RPC are Spark's shuffle.
  */
final case class HistoryParams(
    metricId: String,
    aggregate: String,
    geohashes: Seq[String],
    precision: Int,
    resolution: Option[String] = None,
    interval: Option[String] = None,
    fromMs: Option[Long] = None,
    toMs: Long,
    src: String = "tiles")

final case class SnapshotParams(
    metricId: String,
    aggregate: String,
    tsMs: Long,
    north: Double,
    west: Double,
    south: Double,
    east: Double,
    precision: Int,
    resolution: String,
    geoIndex: String = "quadtiling")

class ExploraService(readings: DataFrame) {

  private val viewCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, String), DataFrame]

  private def view(geoIndex: String, precision: Int, resolution: String): DataFrame =
    viewCache.getOrElseUpdate(
      (geoIndex, precision, resolution), {
        // prefix property: substring of a finer key IS the coarser key,
        // for both geohashes and quadkeys (GeoKernelSpec)
        val geo = geoIndex match {
          case "quadtiling" => substring(col("qk14"), 1, precision)
          case _            => substring(col("gh12"), 1, precision)
        }
        ViewBuilder.build(readings, geo, resolution)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })

  /** GET …/history equivalent (QueryingService.java:38-135). */
  def history(p: HistoryParams): DataFrame = {
    QueryValidation.validateHistory(
      p.geohashes,
      p.precision,
      p.aggregate,
      p.resolution,
      p.interval,
      p.fromMs.getOrElse(0L),
      p.toMs,
      nowMs = p.toMs)
    val res = p.resolution.getOrElse(ExploraQueries.IntervalResolution(p.interval.get))
    val to = Instant.ofEpochMilli(p.toMs)
    val from = p.fromMs
      .map(Instant.ofEpochMilli)
      .getOrElse(ExploraQueries.fromInstant(to, p.interval.getOrElse("5min")))
    val geoPred = ExploraQueries.cellsPredicate(p.geohashes)
    val source =
      if (p.src == "raw") rawAsView(p.precision, res) // reference's src=raw branch (dead there, real here)
      else view("geohashing", p.precision, res)
    ExploraQueries.history(source, p.metricId, geoPred, from, to, p.aggregate)
  }

  /** GET …/snapshot equivalent (QueryingService.java:137-230). */
  def snapshot(p: SnapshotParams): DataFrame = {
    QueryValidation.validateSnapshot(
      p.tsMs, p.north, p.west, p.south, p.east, p.precision, p.aggregate, p.resolution)
    val ts = Instant.ofEpochMilli(p.tsMs)
    // bounded prefix covers work for ANY bbox size: full-length prefixes
    // are exact cell matches, auto-coarsened prefixes are the pushable
    // superset predicate (replaces the reference's 32^k enumeration)
    val prefixes = p.geoIndex match {
      case "quadtiling" =>
        QuadKey.coverPrefixes(p.north, p.west, p.south, p.east, p.precision)
      case _ =>
        GeoHash.coverPrefixes(p.north, p.west, p.south, p.east, p.precision)
    }
    ExploraQueries.snapshot(
      view(p.geoIndex, p.precision, p.resolution),
      p.metricId,
      ExploraQueries.prefixPredicate(prefixes),
      ts,
      p.resolution,
      p.aggregate)
  }

  /** `src=raw`: aggregate straight from unaggregated readings at query
    * time — same result as the view path, without the materialization
    * (the trade the reference's raw stores would have made).
    */
  private def rawAsView(precision: Int, resolution: String): DataFrame =
    ViewBuilder.build(readings, substring(col("gh12"), 1, precision), resolution)
}
