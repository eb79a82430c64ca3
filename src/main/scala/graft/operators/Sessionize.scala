package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over the events stream — the canonical
  * custom-state operator a training-data/analytics pipeline needs
  * beyond the reference's surface.
  *
  * Batch: lag + running sum inside a per-user window (one shuffle on
  * user_id; the window never sees more than one user's events per
  * partition, so it scales with the user-key distribution, not total
  * volume).
  *
  * Streaming: `flatMapGroupsWithState` keeps (lastTs, sessionCount)
  * per user — fixed-size state per key, the Structured Streaming
  * equivalent of a Kafka Streams transformer with a KV store.
  */
object Sessionize {

  /** Per-event session ids: a new session starts when the gap since the
    * user's previous event exceeds `gapSeconds`.
    */
  def withSessionIds(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("ts_s", col("ts").cast("long"))
      .withColumn("prev_s", lag(col("ts_s"), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > gapSeconds, 1).otherwise(0))
      .withColumn(
        "session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats: (user_id, n_sessions, n_events). */
  def userStats(events: DataFrame, gapSeconds: Long): DataFrame =
    withSessionIds(events, gapSeconds)
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  def userStatsSql(gapSeconds: Long): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_s FROM events),
       |l AS (
       |  SELECT user_id, ts_s,
       |         CASE WHEN lag(ts_s) OVER w IS NULL
       |                OR ts_s - lag(ts_s) OVER w > $gapSeconds THEN 1 ELSE 0 END AS ns
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
       |SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events
       |FROM l GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- streaming (custom state) --------------------------------------

  final case class SessionState(lastTsS: Long, sessions: Long, events: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Streaming per-user session counting with explicit state. Events
    * inside a micro-batch are sorted per key (bounded by per-user batch
    * volume); state carries only (lastTs, sessionCount, eventCount) per
    * user — the event count is CUMULATIVE across micro-batches, so every
    * emission matches the batch [[userStats]] semantics over everything
    * seen so far (a per-batch count would diverge after batch 1).
    */
  def streamingUserStats(
      readings: DataFrame,
      gapSeconds: Long): Dataset[UserSessions] = {
    val spark = readings.sparkSession
    import spark.implicits._
    val typed = readings
      .select(col("user_id").cast("long"), col("ts").cast("long").as("ts_s"))
      .as[(Long, Long)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          val sorted = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { t =>
            val isNew = st.lastTsS == Long.MinValue || t - st.lastTsS > gapSeconds
            st = SessionState(t, st.sessions + (if (isNew) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(UserSessions(user, st.sessions, st.events))
      }
  }
}
