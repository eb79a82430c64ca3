package graft.geo

/** Slippy-map tile coordinate at a given zoom level.
  *
  * Behavioral reference: util/Tile.java:3-15 (explora-kafka).
  */
final case class Tile(x: Int, y: Int, zoom: Int)

/** Web-Mercator tile math and Bing-style quadkeys.
  *
  * Behavioral reference: util/QuadHash.java:8-50 (explora-kafka) — same
  * tile formula, digit interleaving and bbox cover enumeration, re-derived
  * from the public slippy-map / Bing quadkey specs. Pure functions, no
  * Spark dependency, so they are usable from UDFs, Catalyst expressions
  * and driver-side planning alike.
  */
object QuadKey {

  /** lat/lon (degrees) → tile containing the point at `zoom`.
    * Mirrors util/QuadHash.java:8-13.
    */
  def tileAt(lat: Double, lon: Double, zoom: Int): Tile = {
    require(zoom >= 1 && zoom <= 30, s"zoom $zoom out of range 1..30") // 1<<31 overflows Int
    val n = 1 << zoom
    val x = math.floor((lon + 180.0) / 360.0 * n).toInt
    val latRad = math.toRadians(lat)
    val y = math
      .floor((1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n)
      .toInt
    Tile(clamp(x, n), clamp(y, n), zoom)
  }

  private def clamp(v: Int, n: Int): Int = math.max(0, math.min(n - 1, v))

  /** Tile → base-4 quadkey string of length `zoom`.
    * Mirrors util/QuadHash.java:15-30 (bit interleave, MSB first).
    */
  def quadKey(tile: Tile): String = {
    val sb = new java.lang.StringBuilder(tile.zoom)
    var i = tile.zoom
    while (i > 0) {
      var digit = '0'
      val mask = 1 << (i - 1)
      if ((tile.x & mask) != 0) digit = (digit + 1).toChar
      if ((tile.y & mask) != 0) digit = (digit + 2).toChar
      sb.append(digit)
      i -= 1
    }
    sb.toString
  }

  /** lat/lon → quadkey at `zoom` (the composed hot-path function). */
  def quadKey(lat: Double, lon: Double, zoom: Int): String =
    quadKey(tileAt(lat, lon, zoom))

  /** Inverse of [[quadKey]]: quadkey string → tile. Used for tests and
    * for deriving tile centers when only the key is stored.
    */
  def tileOf(qk: String): Tile = {
    var x = 0
    var y = 0
    val zoom = qk.length
    var i = 0
    while (i < zoom) {
      val mask = 1 << (zoom - 1 - i)
      qk.charAt(i) match {
        case '0' =>
        case '1' => x |= mask
        case '2' => y |= mask
        case '3' => x |= mask; y |= mask
        case c   => throw new IllegalArgumentException(s"bad quadkey digit '$c' in $qk")
      }
      i += 1
    }
    Tile(x, y, zoom)
  }

  /** NW corner of a tile in degrees (standard slippy-map inverse). */
  def tileNW(tile: Tile): (Double, Double) = {
    val n = (1 << tile.zoom).toDouble
    val lon = tile.x / n * 360.0 - 180.0
    val latRad = math.atan(math.sinh(math.Pi * (1.0 - 2.0 * tile.y / n)))
    (math.toDegrees(latRad), lon)
  }

  /** All quadkeys at `zoom` whose tiles intersect the bbox, sorted.
    * Mirrors util/QuadHash.java:32-50 (two-corner tile enumeration).
    * Corner convention matches the reference: (topLeftLat, topLeftLon,
    * bottomRightLat, bottomRightLon).
    */
  def coverBoundingBox(
      topLeftLat: Double,
      topLeftLon: Double,
      bottomRightLat: Double,
      bottomRightLon: Double,
      zoom: Int,
      maxCells: Int = GeoHash.DefaultMaxCoverCells): Seq[String] = {
    val minTile = tileAt(bottomRightLat, topLeftLon, zoom) // SW → min x, max y
    val maxTile = tileAt(topLeftLat, bottomRightLon, zoom) // NE → max x, min y
    val total = (maxTile.x - minTile.x + 1).toLong * (minTile.y - maxTile.y + 1).toLong
    if (total > maxCells)
      throw new CoverTooLargeException(
        s"bbox cover at zoom $zoom needs $total tiles > cap $maxCells; " +
          "coarsen the zoom or use a prefix predicate")
    val keys = for {
      x <- minTile.x to maxTile.x
      y <- maxTile.y to minTile.y
    } yield quadKey(Tile(x, y, zoom))
    keys.sorted
  }

  /** Center of a tile in degrees (midpoint of its NW and the next
    * tile's NW corner — exact in lon, Mercator-midpoint in lat, which
    * is what the quadkey of the center recovers).
    */
  def tileCenter(tile: Tile): (Double, Double) = {
    val (latNW, lonNW) = tileNW(tile)
    val (latSE, lonSE) = tileNW(Tile(tile.x + 1, tile.y + 1, tile.zoom))
    ((latNW + latSE) / 2.0, (lonNW + lonSE) / 2.0)
  }

  /** Quadkeys at `zoom` whose TILE CENTER lies inside the polygon — the
    * arbitrary-region analogue of [[coverBoundingBox]] (center rule;
    * buffer the polygon by ~one tile when edge tiles must be
    * included). The polygon bbox bounds the candidate walk under the
    * same `maxCells` cap.
    */
  def coverPolygon(
      polygon: Seq[(Double, Double)],
      zoom: Int,
      maxCells: Int = GeoHash.DefaultMaxCoverCells): Seq[String] = {
    val (latMin, latMax, lonMin, lonMax) = Geometry.bboxOf(polygon)
    Geometry.centerFilteredCover(
      polygon,
      coverBoundingBox(latMax, lonMin, latMin, lonMax, zoom, maxCells),
      qk => tileCenter(tileOf(qk)))
  }

  /** Bounded cover for ARBITRARILY large bboxes: quadkey prefixes at the
    * finest zoom whose cover stays within `maxPrefixes`. Every zoom-z
    * tile inside the bbox has one of these prefixes (quadkey prefix ==
    * spatial containment), so `geo LIKE prefix%` predicates select a
    * superset of the exact cover — the same over-selection the
    * reference's geohash mode accepts (QueryingController.java:240) —
    * and the predicate count is bounded no matter the bbox, where an
    * exact fine-zoom cover would blow past any cap.
    */
  def coverPrefixes(
      topLeftLat: Double,
      topLeftLon: Double,
      bottomRightLat: Double,
      bottomRightLon: Double,
      zoom: Int,
      maxPrefixes: Int = 256): Seq[String] = {
    require(maxPrefixes >= 1, s"maxPrefixes must be positive (got $maxPrefixes)")
    var z = zoom
    while (z > 0) {
      val minTile = tileAt(bottomRightLat, topLeftLon, z)
      val maxTile = tileAt(topLeftLat, bottomRightLon, z)
      val total = (maxTile.x - minTile.x + 1).toLong * (minTile.y - maxTile.y + 1).toLong
      if (total <= maxPrefixes)
        return coverBoundingBox(topLeftLat, topLeftLon, bottomRightLat, bottomRightLon, z, maxPrefixes)
      z -= 1
    }
    Seq("") // zoom 0: the whole world, one empty prefix
  }
}
