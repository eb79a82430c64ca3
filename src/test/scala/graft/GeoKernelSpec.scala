package graft

import graft.geo.{GeoHash, QuadKey, Tile}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests via deterministic seeded sampling (plain scalatest;
  * org.scalatestplus is not resolvable offline, and fixed seeds make every
  * run reproducible anyway).
  */
class GeoKernelSpec extends AnyFunSuite {

  private def sampled(n: Int = 300)(body: util.Random => Unit): Unit = {
    val rnd = new util.Random(42)
    (1 to n).foreach(_ => body(rnd))
  }
  private def latIn(r: util.Random, lo: Double = -89.9, hi: Double = 89.9) =
    lo + r.nextDouble() * (hi - lo)
  private def lonIn(r: util.Random, lo: Double = -179.9, hi: Double = 179.9) =
    lo + r.nextDouble() * (hi - lo)

  // --- quadkey: known Bing-maps vectors -------------------------------
  // Bing quadkey spec examples: tile (3,5) zoom 3 -> "213".
  test("quadkey known vectors (Bing spec)") {
    assert(QuadKey.quadKey(Tile(3, 5, 3)) === "213")
    assert(QuadKey.quadKey(Tile(0, 0, 1)) === "0")
    assert(QuadKey.quadKey(Tile(1, 0, 1)) === "1")
    assert(QuadKey.quadKey(Tile(0, 1, 1)) === "2")
    assert(QuadKey.quadKey(Tile(1, 1, 1)) === "3")
  }

  test("Antwerp tile at zoom 14 (FIXTURES.md A3 vector)") {
    val t = QuadKey.tileAt(51.2194, 4.4025, 14)
    assert(t === Tile(8392, 5469, 14))
    assert(QuadKey.quadKey(t).length === 14)
  }

  test("quadkey/tile round-trip") {
    sampled() { r =>
      val zoom = 1 + r.nextInt(20)
      val t = QuadKey.tileAt(latIn(r, -85, 85), lonIn(r), zoom)
      assert(QuadKey.tileOf(QuadKey.quadKey(t)) === t)
    }
  }

  test("quadkey prefix property: parent tile key is a prefix of child key") {
    sampled() { r =>
      val (lat, lon) = (latIn(r, -85, 85), lonIn(r))
      assert(QuadKey.quadKey(lat, lon, 14).startsWith(QuadKey.quadKey(lat, lon, 6)))
    }
  }

  test("coverBoundingBox contains every interior point's quadkey and is sorted") {
    val (n, w, s, e) = (51.31, 4.31, 51.17, 4.50) // Antwerp probe bbox (sim_api_load.sh)
    val zoom = 10
    val cover = QuadKey.coverBoundingBox(n, w, s, e, zoom)
    assert(cover === cover.sorted)
    assert(cover.distinct.size === cover.size)
    sampled() { r =>
      val (lat, lon) = (latIn(r, s, n), lonIn(r, w, e))
      assert(cover.contains(QuadKey.quadKey(lat, lon, zoom)))
    }
  }

  test("tileAt rejects zooms that would overflow Int (1 << 31)") {
    intercept[IllegalArgumentException] { QuadKey.tileAt(51.0, 4.0, 31) }
    intercept[IllegalArgumentException] { QuadKey.tileAt(51.0, 4.0, 0) }
    assert(QuadKey.tileAt(51.0, 4.0, 30).zoom === 30)
  }

  test("quad cover refuses unbounded enumeration (cap)") {
    // world bbox at zoom 14 would be 2^28 tiles — must throw, not OOM
    intercept[IllegalArgumentException] {
      QuadKey.coverBoundingBox(85.0, -179.9, -85.0, 179.9, 14)
    }
    // same bbox under an explicit generous cap at low zoom is fine
    assert(QuadKey.coverBoundingBox(85.0, -179.9, -85.0, 179.9, 4).nonEmpty)
  }

  // --- geohash ---------------------------------------------------------
  test("geohash known vectors") {
    // canonical public test vector
    assert(GeoHash.encode(57.64911, 10.40744, 11) === "u4pruydqqvj")
    assert(GeoHash.encode(42.6, -5.6, 5) === "ezs42")
    // FIXTURES.md A3: u155kpjke2b8 round-trips within its cell
    val (lat, lon) = GeoHash.decode("u155kpjke2b8")
    assert(GeoHash.encode(lat, lon, 12) === "u155kpjke2b8")
  }

  test("geohash encode/decode round-trip at multiple precisions") {
    sampled() { r =>
      val (lat, lon) = (latIn(r), lonIn(r))
      val p = 1 + r.nextInt(12)
      val gh = GeoHash.encode(lat, lon, p)
      assert(gh.length === p)
      val (latLo, latHi, lonLo, lonHi) = GeoHash.decodeBox(gh)
      assert(lat >= latLo && lat <= latHi)
      assert(lon >= lonLo && lon <= lonHi)
      // center re-encodes to the same hash
      val (cLat, cLon) = GeoHash.decode(gh)
      assert(GeoHash.encode(cLat, cLon, p) === gh)
    }
  }

  test("geohash prefix property (precision truncation = spatial containment)") {
    sampled() { r =>
      val (lat, lon) = (latIn(r), lonIn(r))
      assert(GeoHash.encode(lat, lon, 7).startsWith(GeoHash.encode(lat, lon, 5)))
    }
  }

  test("geohash coverBoundingBox covers every interior point, sorted, deduped") {
    val (n, w, s, e) = (51.31, 4.31, 51.17, 4.50)
    val cover = GeoHash.coverBoundingBox(n, w, s, e, 5)
    assert(cover === cover.sorted)
    assert(cover.distinct.size === cover.size)
    assert(cover.nonEmpty)
    sampled() { r =>
      val (lat, lon) = (latIn(r, s, n), lonIn(r, w, e))
      assert(cover.contains(GeoHash.encode(lat, lon, 5)))
    }
  }

  test("geohash cover exact at boundary-aligned bbox (integer grid walk)") {
    // bbox exactly equal to one precision-4 cell must cover that cell and
    // its touched neighbors deterministically (no FP-drift dupes/misses)
    val (latLo, latHi, lonLo, lonHi) = GeoHash.decodeBox("u155")
    val cover = GeoHash.coverBoundingBox(latHi, lonLo, latLo, lonHi, 4)
    assert(cover.contains("u155"))
    assert(cover.distinct.size === cover.size)
  }

  test("coverPrefixes: bounded for any bbox, every interior point's key has a prefix") {
    // world bbox at zoom 14 would be 2^28 tiles; prefixes stay bounded
    val qp = QuadKey.coverPrefixes(85.0, -179.9, -85.0, 179.9, 14, maxPrefixes = 64)
    assert(qp.size <= 64)
    val gp = GeoHash.coverPrefixes(85.0, -179.9, -85.0, 179.9, 8, maxPrefixes = 64)
    assert(gp.size <= 64)
    sampled(100) { r =>
      val (lat, lon) = (latIn(r, -84.9, 84.9), lonIn(r))
      assert(qp.exists(QuadKey.quadKey(lat, lon, 14).startsWith(_)))
      assert(gp.exists(GeoHash.encode(lat, lon, 8).startsWith(_)))
    }
    // small bbox: prefixes == exact cover at the requested precision
    val exact = QuadKey.coverBoundingBox(51.31, 4.31, 51.17, 4.50, 14)
    val pref = QuadKey.coverPrefixes(51.31, 4.31, 51.17, 4.50, 14, maxPrefixes = 200)
    assert(pref === exact)
  }

  test("geohash cover refuses unbounded enumeration (cap)") {
    intercept[IllegalArgumentException] {
      GeoHash.coverBoundingBox(85.0, -179.9, -85.0, 179.9, 8)
    }
    // continent-sized bbox at coarse precision is fine and bounded
    val cover = GeoHash.coverBoundingBox(72.0, -15.0, 35.0, 45.0, 3)
    assert(cover.nonEmpty && cover.size <= GeoHash.DefaultMaxCoverCells)
  }

  test("polygon covers: subset of bbox cover, centers inside, interior points covered") {
    import graft.geo.Geometry
    val tri = Seq((51.31, 4.31), (51.31, 4.50), (51.17, 4.405))
    for ((cover, decodeCenter) <- Seq(
        (GeoHash.coverPolygon(tri, 6), (k: String) => GeoHash.decode(k)),
        (QuadKey.coverPolygon(tri, 14),
          (k: String) => QuadKey.tileCenter(QuadKey.tileOf(k))))) {
      assert(cover.nonEmpty)
      assert(cover === cover.sorted && cover.distinct.length === cover.length)
      // every covered cell's center is inside (re-derived independently)
      cover.foreach { k =>
        val (lat, lon) = decodeCenter(k)
        assert(Geometry.containsPoint(tri, lat, lon), k)
      }
    }
    // subset of the bbox covers
    assert(GeoHash.coverPolygon(tri, 6).toSet
      .subsetOf(GeoHash.coverBoundingBox(51.31, 4.31, 51.17, 4.50, 6).toSet))
    assert(QuadKey.coverPolygon(tri, 14).toSet
      .subsetOf(QuadKey.coverBoundingBox(51.31, 4.31, 51.17, 4.50, 14).toSet))
    // any point WELL inside (margin > one cell) lands in a covered cell
    val inner = Seq((51.30, 4.40), (51.28, 4.38), (51.25, 4.40), (51.29, 4.45))
    inner.foreach { case (lat, lon) =>
      assert(Geometry.containsPoint(tri, lat, lon)) // sanity: really inside
      assert(GeoHash.coverPolygon(tri, 6).contains(GeoHash.encode(lat, lon, 6)), s"($lat,$lon)")
      assert(QuadKey.coverPolygon(tri, 14).contains(QuadKey.quadKey(lat, lon, 14)), s"($lat,$lon)")
    }
    // concave L-shape: the notch is excluded
    val l = Seq((51.30, 4.32), (51.30, 4.48), (51.20, 4.48), (51.20, 4.42), (51.28, 4.42), (51.28, 4.32))
    val lCover = GeoHash.coverPolygon(l, 6)
    assert(lCover.nonEmpty)
    assert(!Geometry.containsPoint(l, 51.22, 4.35)) // in the notch
    assert(!lCover.contains(GeoHash.encode(51.22, 4.35, 6)))
    assert(Geometry.containsPoint(l, 51.22, 4.45))
    assert(lCover.contains(GeoHash.encode(51.22, 4.45, 6)))
  }
}
