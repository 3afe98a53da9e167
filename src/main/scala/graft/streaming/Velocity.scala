package graft.streaming

/** Streaming form of the E4j event-time rolling window (`q_rolling_window`):
  * per-user trailing-24h event count and exact cents sum, emitted AT EVERY
  * EVENT from keyed state — the real-time velocity/rate feature (fraud
  * scoring, rate limiting) whose batch twin is the RANGE-framed window.
  *
  * State per user is the trailing window itself: the (us, event_id, cents)
  * rows newer than `now − windowUs`, evicted as the frontier advances — so
  * state size is bounded by one user's activity inside the window, never
  * their full history.
  *
  * Parity contract (pinned by VelocityStreamSpec): on a time-ordered feed
  * whose micro-batches do not split a same-instant (user, us) run, the
  * emitted rows equal the batch query exactly. The RANGE frame's rule that
  * ALL same-instant peers are in every peer's frame is honored by absorbing
  * each equal-us run into state BEFORE emitting any of its rows; a run
  * split across batches would emit the early rows without their later
  * peers — feeds that cannot guarantee whole runs buffer to the watermark
  * first (the [[TemporalJoins.asofStream]] pattern). Cross-batch stragglers
  * older than the frontier are inserted into the state in timestamp order
  * and emitted with their trailing window computed exactly OVER RETAINED
  * STATE (a bounded scan of the straggler's slice of the deque) — NOT with
  * the frontier totals: an append-at-tail fold would break the deque's
  * ascending invariant, and head-only eviction would then keep the aged
  * straggler inside every LATER conforming row's count until it happened
  * to reach the head — poisoning rows the parity contract does cover. Two
  * residual divergences from the batch twin, both inherent to bounded
  * state on an append-mode stream: (1) the straggler cannot retro-enter
  * windows already emitted (no retractions), and (2) rows in
  * [us − window, frontier − window) were already evicted by earlier
  * in-order emits — eviction follows the frontier — so a straggler's own
  * count/sum can UNDER-report relative to the batch twin when its window
  * reaches below the evicted horizon.
  */
object Velocity {

  /** Trailing-window rows (us, event_id, cents), ascending (us, event_id). */
  final case class VelocityState(rows: List[(Long, Long, Long)])

  final case class VelocityRow(
      event_id: Long, user_id: Long, us: Long, n_24h: Long, cents_24h: Long)

  /** Input rows: (user_id, us, event_id, cents) — cents already quantized
    * (the batch query's `round(value * 100)`), so the rolling sum is exact
    * integer arithmetic here too.
    *
    * State eviction for IDLE users (ADVICE r8, default since VERDICT r9
    * #4): a processing-time timeout drops the state of any user silent
    * longer than `idleTimeoutMs` — DEFAULT 2× the window duration — so a
    * default-constructed stream has state bounded by ACTIVE users, not by
    * every user ever seen, and an evicted user's next event simply
    * recreates their window from empty (correct whenever event time tracks
    * arrival time: rows ≥ 2 windows stale are outside the trailing window
    * anyway — VelocityStreamSpec pins the drop + recreate cycle). The
    * input tuples carry event time as a plain long, so an event-time
    * timeout (which needs a watermarked timestamp column) is unavailable;
    * the processing-time form is exact for the near-real-time feeds this
    * operator targets.
    *
    * Pass an EXPLICIT `idleTimeoutMs = None` for the unbounded variant —
    * needed when (1) a historic REPLAY may stall mid-feed longer than the
    * timeout yet still need the evicted windows (replayed event time does
    * not track wall time), or (2) the caller runs the engine's default
    * as-fast-as-possible trigger AND cannot tolerate no-data batches:
    * registered processing-time timeouts make `shouldRunAnotherBatch`
    * true on every trigger, so that configuration busy-loops empty
    * batches (and `processAllAvailable` test harnesses may not settle).
    * The bounded default pairs with a PACED trigger
    * (`Trigger.ProcessingTime(...)`), which turns those timeout checks
    * into one cheap batch per interval — the normal production shape.
    */
  def velocityStream(
      events: org.apache.spark.sql.Dataset[(Long, Long, Long, Long)],
      windowUs: Long): org.apache.spark.sql.Dataset[VelocityRow] =
    velocityStream(events, windowUs, Some(math.max(1L, 2 * windowUs / 1000)))

  /** Explicit-eviction variant of [[velocityStream]]; `None` opts into the
    * unbounded (evict-never) state — see the eviction notes above.
    */
  def velocityStream(
      events: org.apache.spark.sql.Dataset[(Long, Long, Long, Long)],
      windowUs: Long,
      idleTimeoutMs: Option[Long]): org.apache.spark.sql.Dataset[VelocityRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[VelocityState, VelocityRow](
        OutputMode.Append(), timeoutConf) {
        (user: Long, rows: Iterator[(Long, Long, Long, Long)], state: GroupState[VelocityState]) =>
          if (state.hasTimedOut) {
            // idle past the timeout: the whole trailing window has aged out
            state.remove()
            Iterator.empty
          } else {
          // running (count, centsSum) over a deque: append the run, evict
          // the aged prefix, emit from the maintained totals — O(E + batch)
          // per user per batch. The previous List form copied and re-summed
          // the whole window per distinct-timestamp run (O(runs × E)),
          // quadratic exactly on the hot high-velocity keys this operator
          // scores. Cents are integer Longs, so the running subtraction is
          // exact — no float-drift concern in the rolling sum.
          val dq = scala.collection.mutable.ArrayDeque
            .from(state.getOption.map(_.rows).getOrElse(Nil))
          var n     = dq.length.toLong
          var cents = dq.iterator.map(_._3).sum
          val out = scala.collection.mutable.ArrayBuffer.empty[VelocityRow]
          val arr = rows.toArray.sortBy(r => (r._2, r._3))
          var i = 0
          while (i < arr.length) {
            var j = i
            while (j < arr.length && arr(j)._2 == arr(i)._2) j += 1
            val us = arr(i)._2
            if (dq.isEmpty || dq.last._1 <= us) {
              // in-order run: absorb the WHOLE equal-us run before
              // emitting (RANGE peers), evict the aged head, emit totals
              arr.slice(i, j).foreach { r =>
                dq.append((r._2, r._3, r._4)); n += 1; cents += r._4
              }
              while (dq.nonEmpty && dq.head._1 < us - windowUs) { // inclusive lower bound
                val h = dq.removeHead(); n -= 1; cents -= h._3
              }
              arr.slice(i, j).foreach { r =>
                out += VelocityRow(r._3, user, r._2, n, cents)
              }
            } else {
              // cross-batch straggler (us behind the state frontier):
              // INSERT in timestamp order — an append would break the
              // ascending invariant head-eviction depends on, leaving the
              // aged straggler inside every later conforming row's totals —
              // and emit the straggler's own exact trailing window by a
              // bounded head scan (≤ deque length, stragglers are the rare
              // contract-violation path). No eviction here: the frontier
              // has not advanced, and rows past `us` are ahead of this
              // window, not aged out of it.
              var k = dq.length
              while (k > 0 && dq(k - 1)._1 > us) k -= 1
              arr.slice(i, j).foreach { r =>
                dq.insert(k, (r._2, r._3, r._4)); n += 1; cents += r._4; k += 1
              }
              var sn = 0L
              var sc = 0L
              val it = dq.iterator
              var ahead = false
              while (!ahead && it.hasNext) {
                val e = it.next()
                if (e._1 > us) ahead = true
                else if (e._1 >= us - windowUs) { sn += 1; sc += e._3 }
              }
              arr.slice(i, j).foreach { r =>
                out += VelocityRow(r._3, user, r._2, sn, sc)
              }
            }
            i = j
          }
          state.update(VelocityState(dq.toList))
          // re-armed on every batch with data; fires only after a full
          // idle-timeout of silence for this user
          idleTimeoutMs.foreach(t => state.setTimeoutDuration(math.max(1L, t)))
          out.iterator
          }
      }
  }
}
