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

  /** History-query parameters (QueryingService.java:46-114). */
  def validateHistory(
      geohashes: Seq[String],
      precision: Int,
      aggregate: String,
      resolution: Option[String],
      interval: Option[String],
      fromMs: Long,
      toMs: Long,
      nowMs: Long): Unit = {
    req(geohashes.nonEmpty, "at least one geohash prefix is required")
    req(
      geohashes.forall(_.length == precision),
      s"every geohash must have length $precision (got ${geohashes.map(_.length).distinct.mkString(",")})")
    req(
      ExploraQueries.SupportedAggregates.contains(aggregate),
      s"aggregate '$aggregate' not in ${ExploraQueries.SupportedAggregates.mkString(",")}")
    req(
      SupportedPrecisions.contains(precision),
      s"precision $precision not in ${SupportedPrecisions.mkString(",")}")
    req(
      resolution.isDefined ^ interval.isDefined,
      "exactly one of resolution or interval must be given")
    resolution.foreach(r =>
      req(
        SupportedResolutions.contains(r),
        s"resolution '$r' not in ${SupportedResolutions.mkString(",")}"))
    interval.foreach(i =>
      req(
        ExploraQueries.IntervalResolution.contains(i),
        s"interval '$i' not in ${ExploraQueries.IntervalResolution.keys.toSeq.sorted.mkString(",")}"))
    req(fromMs < toMs, s"from ($fromMs) must be before to ($toMs)")
    req(fromMs <= nowMs, s"from ($fromMs) must not be in the future")
  }

  /** Snapshot-query parameters (QueryingService.java:145-222). */
  def validateSnapshot(
      tsMs: Long,
      north: Double,
      west: Double,
      south: Double,
      east: Double,
      precision: Int,
      aggregate: String,
      resolution: String): Unit = {
    req(tsMs >= 0, s"timestamp must be non-negative (got $tsMs)")
    req(
      ExploraQueries.SupportedAggregates.contains(aggregate),
      s"aggregate '$aggregate' not in ${ExploraQueries.SupportedAggregates.mkString(",")}")
    req(
      SupportedPrecisions.contains(precision),
      s"precision $precision not in ${SupportedPrecisions.mkString(",")}")
    req(
      SupportedResolutions.contains(resolution),
      s"resolution '$resolution' not in ${SupportedResolutions.mkString(",")}")
    req(north > south, s"bbox north ($north) must exceed south ($south)")
    req(east > west, s"bbox east ($east) must exceed west ($west)")
    req(north <= 90 && south >= -90, "bbox latitudes out of range")
    req(east <= 180 && west >= -180, "bbox longitudes out of range")
  }
}
