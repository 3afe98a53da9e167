package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of E4 sessionization (SURVEY.md §2.11): Spark's native
  * `session_window` with a watermark — the event-time generalization of the
  * batch lag/cumulative-gap query (`q_sessionize`). Works unchanged on batch
  * frames (no watermark needed), which is how the spec cross-checks it
  * against the batch form.
  *
  * Boundary semantics differ from the batch query by one ulp of the gap: a
  * follower exactly `gap` later starts a new session here (window is
  * half-open [t, t+gap)) but continues the session in the lag-based form
  * (`diff > gap` starts new). Irrelevant for real event streams; documented
  * for exactness.
  */
object Sessions {

  def sessionize(events: DataFrame, tsCol: String = "ts", userCol: String = "user_id",
      gap: String = "30 minutes", watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    src
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event"))
      .select(col(userCol), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_events"),
        col("first_event"), col("last_event"))
  }

  /** An open per-user session carried across micro-batches. */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  /** A closed session emitted downstream. */
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** The custom-state form of sessionization:
    * `groupByKey → flatMapGroupsWithState` folding each user's events into an
    * [[OpenSession]] and emitting a [[ClosedSession]] whenever the gap is
    * exceeded — the KeyValueGroupedDataset state API the built-in
    * `session_window` compiles away from you, exposed for session logic the
    * built-in can't express (per-session caps, custom merge rules, side
    * effects on close). Events within a batch are sorted per user; state
    * holds at most one open session per user (bounded memory at any scale —
    * users partition the state store).
    *
    * Input: (user_id, event micros). Output: closed sessions only; the final
    * open session stays in state (flush by sending a far-future tick, as the
    * spec does).
    */
  def sessionizeStateful(
      events: org.apache.spark.sql.Dataset[(Long, Long)],
      gapUs: Long): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[OpenSession]) =>
          val ts = rows.map(_._2).toArray.sorted
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var open = state.getOption
          ts.foreach { t =>
            open match {
              case Some(s) if t - s.lastUs <= gapUs =>
                open = Some(s.copy(lastUs = t, n = s.n + 1))
              case Some(s) =>
                closed += ClosedSession(user, s.startUs, s.lastUs, s.n)
                open = Some(OpenSession(t, t, 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }
}
