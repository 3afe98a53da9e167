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
    * effects on close).
    *
    * Semantics: the carried open session and the batch's events gap-fold
    * as ONE ascending interval list — exactly the batch query's merge rule,
    * so cross-batch stragglers within the open session's gap envelope merge
    * into it (start/end expand), mutually-in-gap stragglers fold into one
    * session rather than one singleton each, and a straggler run can bridge
    * upward into the open session. Straggler sessions more than `gap` below
    * the open one are emitted closed at the end of the batch (a later batch
    * could in principle still have merged into them — the price of eager
    * emission; the event-time form below buffers until the watermark proves
    * closure instead). With `idleTimeoutMs` set (the production default), idle
    * users are evicted by a processing-time timeout — their final session is
    * emitted on eviction, so state stays bounded by ACTIVE users, not all
    * users ever seen. Pass None for synchronous test harnesses:
    * processing-time timeouts make the engine schedule extra batches, which
    * keeps `processAllAvailable()` from ever observing a quiet stream.
    *
    * Input: (user_id, event micros). Output: closed sessions.
    */
  def sessionizeStateful(
      events: org.apache.spark.sql.Dataset[(Long, Long)],
      gapUs: Long,
      idleTimeoutMs: Option[Long] = Some(3600000L)): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), timeoutConf) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // idle eviction: flush the final session and release the state
            val out = state.getOption
              .map(s => ClosedSession(user, s.startUs, s.lastUs, s.n)).iterator
            state.remove()
            out
          } else {
            // gap-fold the carried open session and this batch's events as
            // one ascending interval list — the batch query's merge rule.
            // A per-event scan against the open session alone would emit
            // each far-older straggler as its own singleton even when two
            // stragglers are within gap of EACH OTHER (inflating session
            // counts on any out-of-order burst), and would split a
            // straggler run that bridges into the open session.
            val evs: Seq[OpenSession] =
              rows.map(_._2).toArray.sorted.toSeq.map(t => OpenSession(t, t, 1))
            val intervals = state.getOption match {
              case Some(s) =>
                val (before, after) = evs.partition(_.startUs < s.startUs)
                (before :+ s) ++ after
              case None => evs
            }
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open: Option[OpenSession] = None
            intervals.foreach { iv =>
              open match {
                case Some(s) if iv.startUs <= s.lastUs + gapUs =>
                  // ascending starts make min(start) = s.startUs; last can
                  // only stay or grow, so end >= start always holds
                  open = Some(OpenSession(
                    s.startUs, math.max(s.lastUs, iv.lastUs), s.n + iv.n))
                case Some(s) =>
                  closed += ClosedSession(user, s.startUs, s.lastUs, s.n)
                  open = Some(iv)
                case None =>
                  open = Some(iv)
              }
            }
            open.foreach(state.update)
            idleTimeoutMs.foreach(state.setTimeoutDuration)
            closed.iterator
          }
      }
  }

  /** Events of a user's not-yet-provably-closed sessions, buffered in state. */
  final case class PendingEvents(ts: Seq[Long])

  /** Exact event-time micros: `getTime` alone truncates to milliseconds, so
    * sub-ms gap decisions would disagree with the micros-typed sibling form.
    */
  private[streaming] def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Event-time variant of [[sessionizeStateful]]: a session is emitted
    * exactly when the WATERMARK passes its gap envelope — the semantically
    * correct closure rule (the stream can prove no more in-gap events can
    * arrive), with no wall-clock dependence.
    *
    * Unlike the processing-time form (which folds eagerly and must guess
    * about stragglers), state buffers the RAW events of sessions that are
    * not yet provably closed and refolds on every invocation, so the output
    * is a pure function of (admitted events, watermark): micro-batch
    * boundaries cannot split a session or emit a straggler as its own
    * singleton. State is bounded by the watermark horizon — a session's
    * events leave state as soon as the watermark passes `last + gap`.
    *
    * Input: (user_id, event timestamp); `watermark` is the lateness bound
    * driving both admission and the timeout clock.
    */
  def sessionizeEventTime(
      events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
      gapUs: Long,
      watermark: String = "10 minutes"): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .toDF("user_id", "ts")
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PendingEvents, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)], state: GroupState[PendingEvents]) =>
          // one code path for data batches AND timeouts (rows is just empty
          // there): merge, refold, emit what the watermark proves closed
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val all = (state.getOption.map(_.ts).getOrElse(Seq.empty[Long]) ++
            rows.map(r => micros(r._2))).sorted
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            // fold the sorted events into gap-separated sessions
            val sessions = all.tail.foldLeft(Vector(Vector(all.head))) { (acc, t) =>
              if (t <= acc.last.last + gapUs) acc.init :+ (acc.last :+ t)
              else acc :+ Vector(t)
            }
            val (closed, open) = sessions.partition(s => s.last + gapUs < wmUs)
            if (open.nonEmpty) {
              state.update(PendingEvents(open.flatten))
              // wake when the watermark can first prove the earliest open
              // session closed; must sit strictly above the current watermark
              state.setTimeoutTimestamp(math.max(
                open.map(_.last).min / 1000L + gapUs / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            } else state.remove()
            closed.iterator
              .map(s => ClosedSession(user, s.head, s.last, s.length.toLong))
          }
      }
  }
}
