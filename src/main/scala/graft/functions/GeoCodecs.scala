package graft.functions

import graft.geo.{GeoHash, QuadKey}
import org.apache.spark.unsafe.types.UTF8String

/** Static, codegen-callable bridges from Catalyst internal types to the
  * pure geo kernel ([[graft.geo.QuadKey]] / [[graft.geo.GeoHash]]).
  * Generated Java code calls these directly (see GeoExpressions.scala),
  * so they must stay simple static methods on an object with no state.
  */
object GeoCodecs {

  def quadKey(lat: Double, lon: Double, zoom: Int): UTF8String =
    UTF8String.fromString(QuadKey.quadKey(lat, lon, zoom))

  def geohashEncode(lat: Double, lon: Double, precision: Int): UTF8String =
    UTF8String.fromString(GeoHash.encode(lat, lon, precision))

  def geohashLat(gh: UTF8String): Double = GeoHash.decode(gh.toString)._1

  def geohashLon(gh: UTF8String): Double = GeoHash.decode(gh.toString)._2

  /** Geohash cell center → containing quadkey, the exact re-indexing step
    * the reference performs per record (geohash → lat/lon → tile → key;
    * ingestion/IngestStream.java:313-316 + util/QuadHash.java:8-30).
    */
  def geohashToQuadKey(gh: UTF8String, zoom: Int): UTF8String = {
    val (lat, lon) = GeoHash.decode(gh.toString)
    UTF8String.fromString(QuadKey.quadKey(lat, lon, zoom))
  }
}
