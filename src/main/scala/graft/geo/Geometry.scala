package graft.geo

/** A cover would need more cells than its cap — the ONE condition
  * callers may legitimately degrade on (e.g. fall back to a coarser
  * prefix cover). A dedicated type so catch sites don't swallow
  * genuine argument errors that also surface as
  * IllegalArgumentException (ADVICE round 6).
  */
class CoverTooLargeException(msg: String) extends IllegalArgumentException(msg)

/** Minimal planar geometry for driver-side cover computation (query
  * planning only — covers become IN/prefix predicates, never per-row
  * compute). Polygons are sequences of (lat, lon) vertices, implicitly
  * closed; degrees treated as planar coordinates, which is the same
  * approximation every slippy-grid cover already makes at city scale.
  */
object Geometry {

  /** Even-odd ray-casting containment test. Boundary points are
    * half-open (a point exactly on an edge counts on one side only) —
    * irrelevant for cell-center tests, which sit strictly inside cells.
    */
  def containsPoint(polygon: Seq[(Double, Double)], lat: Double, lon: Double): Boolean = {
    require(polygon.length >= 3, s"polygon needs >= 3 vertices (got ${polygon.length})")
    var inside = false
    var j = polygon.length - 1
    var i = 0
    while (i < polygon.length) {
      val (yi, xi) = polygon(i)
      val (yj, xj) = polygon(j)
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** (latMin, latMax, lonMin, lonMax) of the vertex set. */
  def bboxOf(polygon: Seq[(Double, Double)]): (Double, Double, Double, Double) = {
    require(polygon.length >= 3, s"polygon needs >= 3 vertices (got ${polygon.length})")
    (polygon.map(_._1).min, polygon.map(_._1).max,
      polygon.map(_._2).min, polygon.map(_._2).max)
  }

  /** Shared center-rule polygon cover: keep the candidate keys whose
    * decoded center lies inside the polygon. One definition for both
    * geo indexes (GeoHash.coverPolygon / QuadKey.coverPolygon) so the
    * candidate-walk-plus-filter logic cannot diverge between them.
    */
  def centerFilteredCover(
      polygon: Seq[(Double, Double)],
      candidates: Seq[String],
      center: String => (Double, Double)): Seq[String] =
    candidates.filter { k =>
      val (lat, lon) = center(k)
      containsPoint(polygon, lat, lon)
    }
}
