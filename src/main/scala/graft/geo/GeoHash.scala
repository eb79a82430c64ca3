package graft.geo

/** Geohash encode/decode and bounding-box cover.
  *
  * The reference delegates these to the public davidmoten `geo` library
  * (explora-kafka pom.xml:193-197; calls at ingestion/IngestStream.java:313
  * and querying/QueryingController.java:240,270). Re-implemented here from
  * the public geohash spec (base-32, lon-first bit interleave) so the
  * engine has zero external deps. Pure functions, no Spark dependency.
  */
object GeoHash {

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Base32Inv: Array[Int] = {
    val a = Array.fill(128)(-1)
    Base32.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** lat/lon (degrees) → geohash string of `precision` base-32 chars. */
  def encode(lat: Double, lon: Double, precision: Int): String = {
    require(precision > 0 && precision <= 22, s"precision $precision out of range")
    val sb = new java.lang.StringBuilder(precision)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** Bounding box of a geohash cell: (latLo, latHi, lonLo, lonHi). */
  def decodeBox(gh: String): (Double, Double, Double, Double) = {
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var i = 0
    while (i < gh.length) {
      val c = gh.charAt(i).toLower
      val v = if (c < 128) Base32Inv(c.toInt) else -1
      require(v >= 0, s"bad geohash char '$c' in $gh")
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (isLon) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        isLon = !isLon
        b -= 1
      }
      i += 1
    }
    (latLo, latHi, lonLo, lonHi)
  }

  /** Geohash → cell-center (lat, lon) — same convention as the reference's
    * `GeoHash.decodeHash` (cell midpoint), used to re-index a geohash into
    * a quadtile (ingestion/IngestStream.java:313).
    */
  def decode(gh: String): (Double, Double) = {
    val (latLo, latHi, lonLo, lonHi) = decodeBox(gh)
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  /** Width/height in degrees of a geohash cell at `precision`. */
  def cellSize(precision: Int): (Double, Double) = {
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2 // lon gets the extra bit (lon-first)
    val latBits = bits / 2
    (180.0 / (1L << latBits).toDouble, 360.0 / (1L << lonBits).toDouble)
  }

  /** All geohashes at `precision` whose cells intersect the bbox, sorted.
    * Matches the behavior of the davidmoten `GeoHash.coverBoundingBox`
    * call at querying/QueryingController.java:240: enumerate the grid of
    * cells touched by the box.
    *
    * Walks INTEGER cell indices (no floating-point accumulation, so no
    * skipped/duplicated boundary cells) and refuses covers above
    * `maxCells`, mirroring the reference library's bounded
    * `hashesToCoverBoundingBox(..., maxHashes)` variant. Large covers
    * should instead become prefix predicates at a coarser precision
    * (see graft.queries.SnapshotQuery).
    */
  def coverBoundingBox(
      topLeftLat: Double,
      topLeftLon: Double,
      bottomRightLat: Double,
      bottomRightLon: Double,
      precision: Int,
      maxCells: Int = DefaultMaxCoverCells): Seq[String] = {
    val (latStep, lonStep) = cellSize(precision)
    val latMin = math.max(-90.0, math.min(topLeftLat, bottomRightLat))
    val latMax = math.min(90.0, math.max(topLeftLat, bottomRightLat))
    val lonMin = math.max(-180.0, math.min(topLeftLon, bottomRightLon))
    val lonMax = math.min(180.0, math.max(topLeftLon, bottomRightLon))
    val latCells = 1L << (5 * precision / 2)      // lat gets floor(bits/2)
    val lonCells = 1L << ((5 * precision + 1) / 2)
    def idx(v: Double, lo: Double, step: Double, n: Long): Long =
      math.min(n - 1, math.max(0L, math.floor((v - lo) / step).toLong))
    val li0 = idx(latMin, -90.0, latStep, latCells)
    val li1 = idx(latMax, -90.0, latStep, latCells)
    val lo0 = idx(lonMin, -180.0, lonStep, lonCells)
    val lo1 = idx(lonMax, -180.0, lonStep, lonCells)
    val total = (li1 - li0 + 1) * (lo1 - lo0 + 1)
    if (total > maxCells)
      throw new CoverTooLargeException(
        s"bbox cover at precision $precision needs $total cells > cap $maxCells; " +
          "coarsen the precision or use a prefix predicate")
    val hashes = new scala.collection.mutable.ArrayBuffer[String](total.toInt)
    var li = li0
    while (li <= li1) {
      val lat = -90.0 + (li + 0.5) * latStep
      var lo = lo0
      while (lo <= lo1) {
        hashes += encode(lat, -180.0 + (lo + 0.5) * lonStep, precision)
        lo += 1
      }
      li += 1
    }
    hashes.sorted.toSeq
  }

  /** Driver-side cover cap: covers are query-planning inputs (IN-lists /
    * prefix predicates), so anything beyond ~64k cells belongs in a range
    * predicate, not an enumeration.
    */
  val DefaultMaxCoverCells: Int = 65536

  /** Geohashes at `precision` whose CELL CENTER lies inside the polygon
    * — the arbitrary-region analogue of [[coverBoundingBox]] (the
    * reference's history API takes a client-provided geohash list,
    * QueryingService.java:46-114; this computes that list from a real
    * region boundary instead of a hand-picked set). Center rule:
    * boundary cells whose center falls outside are excluded — buffer
    * the polygon by ~one cell size when edge cells must be included.
    * Same integer grid walk and `maxCells` bound as the bbox cover;
    * the polygon bbox is the walked superset, so the cap binds the
    * candidate walk, not just the result.
    */
  def coverPolygon(
      polygon: Seq[(Double, Double)],
      precision: Int,
      maxCells: Int = DefaultMaxCoverCells): Seq[String] = {
    val (latMin, latMax, lonMin, lonMax) = Geometry.bboxOf(polygon)
    Geometry.centerFilteredCover(
      polygon,
      coverBoundingBox(latMax, lonMin, latMin, lonMax, precision, maxCells),
      decode)
  }

  /** Bounded cover for ARBITRARILY large bboxes: geohash prefixes at the
    * coarsest precision whose cover fits `maxPrefixes` (prefix ==
    * containment, so `geo LIKE prefix%` selects a superset of the exact
    * cover with a bounded predicate count — see QuadKey.coverPrefixes).
    */
  def coverPrefixes(
      topLeftLat: Double,
      topLeftLon: Double,
      bottomRightLat: Double,
      bottomRightLon: Double,
      precision: Int,
      maxPrefixes: Int = 256): Seq[String] = {
    require(maxPrefixes >= 1, s"maxPrefixes must be positive (got $maxPrefixes)")
    var p = precision
    while (p > 0) {
      val (latStep, lonStep) = cellSize(p)
      val latCells =
        (math.floor((math.max(topLeftLat, bottomRightLat) + 90) / latStep) -
          math.floor((math.min(topLeftLat, bottomRightLat) + 90) / latStep) + 1).toLong
      val lonCells =
        (math.floor((math.max(topLeftLon, bottomRightLon) + 180) / lonStep) -
          math.floor((math.min(topLeftLon, bottomRightLon) + 180) / lonStep) + 1).toLong
      if (latCells * lonCells <= maxPrefixes)
        return coverBoundingBox(topLeftLat, topLeftLon, bottomRightLat, bottomRightLon, p, maxPrefixes)
      p -= 1
    }
    Seq("")
  }
}
