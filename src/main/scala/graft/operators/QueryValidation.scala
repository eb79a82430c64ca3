package graft.operators

/** Query-parameter validation (SURVEY §2.2 P12), mirroring the REST
  * facade's checks: querying/QueryingService.java:46-114 (history) and
  * :145-222 (snapshot). The reference returns HTTP 400 envelopes; here
  * invalid input raises IllegalArgumentException with the same
  * conditions, so any serving layer can map them to its own error shape.
  */
object QueryValidation {

  val SupportedResolutions: Seq[String] = Seq("min", "hour", "day", "month")

  /** The reference's precision list is env-configurable
    * (util/AppConfig.java:13, dev default 6,7 / k8s 14); the library
    * accepts the full useful geohash/quadkey range.
    */
  val SupportedPrecisions: Seq[Int] = 4 to 16

  private def req(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new IllegalArgumentException(msg)

  /** History-query parameters, checked in the REFERENCE'S order so a
    * request violating several conditions surfaces the same first
    * failure a reference user would see (QueryingService.java:46-114:
    * geohashes → aggregate → [numeric parse, caller-side] → from-in-
    * future → from≥to (only when to is set) → precision → the
    * resolution-WINS dispatch). Extension checks with no reference
    * analogue (geohash length) come last.
    */
  def validateHistory(
      geohashes: Seq[String],
      precision: Int,
      aggregate: String,
      resolution: Option[String],
      interval: Option[String],
      fromMs: Long,
      toMs: Long,
      nowMs: Long): Unit = {
    // QueryingService.java:47-56 (exact reference error text)
    req(geohashes.nonEmpty, "You need to provide a list of comma-separated geohash prefixes")
    // :59-68
    req(
      ExploraQueries.SupportedAggregates.contains(aggregate),
      s"aggregate $aggregate is not yet supported")
    // :88-95
    req(fromMs <= nowMs, "fromDate cannot be set to a future date")
    // :97-106 — only enforced when a `to` bound was actually given
    if (toMs > 0)
      req(fromMs < toMs, "fromDate parameter should be less than toDate")
    // :109-116
    req(
      SupportedPrecisions.contains(precision),
      s"precision $precision is not yet supported")
    // :118-131 — the dispatch itself: a VALID resolution selects the
    // spatial branch (interval ignored), else a VALID interval selects
    // the spatio-temporal branch, else 400. Both-set is legal,
    // resolution wins — matching the reference's if/else-if.
    req(
      historyBranch(resolution, interval).isDefined,
      s"Invalid values for resolution (${resolution.getOrElse("")}) or interval (${interval.getOrElse("")})")
    // extension (no reference analogue — ordered last)
    req(
      geohashes.forall(_.length == precision),
      s"every geohash must have length $precision (got ${geohashes.map(_.length).distinct.mkString(",")})")
  }

  /** The reference's history dispatch (QueryingService.java:118-131):
    * Left(resolution) = the spatial branch, Right(interval) = the
    * spatio-temporal branch, None = neither parameter is usable.
    */
  def historyBranch(
      resolution: Option[String],
      interval: Option[String]): Option[Either[String, String]] =
    resolution.filter(SupportedResolutions.contains).map(Left(_))
      .orElse(interval.filter(ExploraQueries.IntervalResolution.contains).map(Right(_)))

  /** Snapshot-query parameters, checked in the REFERENCE'S order with
    * its exact error texts (QueryingService.java:145-222: ts →
    * [bbox presence/shape, caller-side] → aggregate → precision).
    * Extension checks the reference never makes (resolution validity,
    * bbox orientation/range — it would fail later with a raw exception)
    * come last.
    */
  def validateSnapshot(
      tsMs: Long,
      north: Double,
      west: Double,
      south: Double,
      east: Double,
      precision: Int,
      aggregate: String,
      resolution: String): Unit = {
    req(tsMs >= 0, "You need to provide a valid timestamp in milliseconds")
    req(
      ExploraQueries.SupportedAggregates.contains(aggregate),
      s"aggregate $aggregate is not yet supported")
    req(
      SupportedPrecisions.contains(precision),
      s"geohash precision $precision is not yet supported")
    req(
      SupportedResolutions.contains(resolution),
      s"resolution '$resolution' not in ${SupportedResolutions.mkString(",")}")
    req(north > south, s"bbox north ($north) must exceed south ($south)")
    req(east > west, s"bbox east ($east) must exceed west ($west)")
    req(north <= 90 && south >= -90, "bbox latitudes out of range")
    req(east <= 180 && west >= -180, "bbox longitudes out of range")
  }
}
