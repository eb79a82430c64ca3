package graft

import graft.geo.{GeoHash, QuadKey, Tile}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.scalatestplus.scalacheck.ScalaCheckPropertyChecks

class GeoKernelSpec extends AnyFunSuite with ScalaCheckPropertyChecks {

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
    assert(t === Tile(8392, 5467, 14))
    assert(QuadKey.quadKey(t).length === 14)
  }

  test("quadkey/tile round-trip") {
    forAll(Gen.choose(-85.0, 85.0), Gen.choose(-179.99, 179.99), Gen.choose(1, 20)) {
      (lat: Double, lon: Double, zoom: Int) =>
        val t = QuadKey.tileAt(lat, lon, zoom)
        assert(QuadKey.tileOf(QuadKey.quadKey(t)) === t)
    }
  }

  test("quadkey prefix property: parent tile key is a prefix of child key") {
    forAll(Gen.choose(-85.0, 85.0), Gen.choose(-179.99, 179.99)) { (lat: Double, lon: Double) =>
      val fine = QuadKey.quadKey(lat, lon, 14)
      val coarse = QuadKey.quadKey(lat, lon, 6)
      assert(fine.startsWith(coarse))
    }
  }

  test("coverBoundingBox contains every interior point's quadkey and is sorted") {
    val (n, w, s, e) = (51.31, 4.31, 51.17, 4.50) // Antwerp probe bbox (sim_api_load.sh)
    val zoom = 10
    val cover = QuadKey.coverBoundingBox(n, w, s, e, zoom)
    assert(cover === cover.sorted)
    assert(cover.distinct.size === cover.size)
    forAll(Gen.choose(s, n), Gen.choose(w, e)) { (lat: Double, lon: Double) =>
      assert(cover.contains(QuadKey.quadKey(lat, lon, zoom)))
    }
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
    forAll(Gen.choose(-89.9, 89.9), Gen.choose(-179.9, 179.9), Gen.choose(1, 12)) {
      (lat: Double, lon: Double, p: Int) =>
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
    forAll(Gen.choose(-89.9, 89.9), Gen.choose(-179.9, 179.9)) { (lat: Double, lon: Double) =>
      assert(GeoHash.encode(lat, lon, 7).startsWith(GeoHash.encode(lat, lon, 5)))
    }
  }

  test("geohash coverBoundingBox covers every interior point, sorted, deduped") {
    val (n, w, s, e) = (51.31, 4.31, 51.17, 4.50)
    val cover = GeoHash.coverBoundingBox(n, w, s, e, 5)
    assert(cover === cover.sorted)
    assert(cover.distinct.size === cover.size)
    assert(cover.nonEmpty)
    forAll(Gen.choose(s, n), Gen.choose(w, e)) { (lat: Double, lon: Double) =>
      assert(cover.contains(GeoHash.encode(lat, lon, 5)))
    }
  }
}
