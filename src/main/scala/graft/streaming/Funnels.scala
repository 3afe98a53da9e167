package graft.streaming

/** Streaming form of the E4e ordered funnel (`q_funnel_steps`): per-user
  * stage progression tracked in keyed state, emitting a row the moment a
  * user first reaches each stage — real-time conversion tracking over an
  * unbounded event stream, state three Longs per user.
  *
  * Semantics: events fold in ARRIVAL order — batch by batch, event-time
  * order within a micro-batch (the group iterator is unordered; sorting
  * inside the batch makes replays deterministic). On a time-ordered feed
  * the fold is EXACTLY the batch query's stacked running-min algebra (the
  * running minimum of qualifying timestamps IS the fold state), which is
  * how the spec pins parity. A cross-batch straggler older than the open
  * state is ignored rather than rewriting history — the same
  * order-dependent contract as [[Packing.packStream]]; feeds that need
  * event-time finality buffer to the watermark first (the
  * [[TemporalJoins.asofStream]] pattern).
  */
object Funnels {

  /** (-1 = stage not reached yet) */
  final case class FunnelState(tView: Long, tClick: Long, tPurchase: Long)

  /** Emitted once per (user, stage) when the stage is first reached:
    * stage 1 = view, 2 = qualifying click, 3 = qualifying purchase.
    */
  final case class StageReached(user_id: Long, stage: Int, at_us: Long)

  /** Input rows: (user_id, event micros, event_id, event_type). `stepUs` is
    * the per-stage deadline (next stage strictly after the previous, within
    * stepUs of it) — the batch query's constant. event_id is carried for the
    * within-batch sort only: the batch query orders by (us, event_id), and
    * sorting by the same tuple keeps replay determinism structural rather
    * than an accident of arrival order on same-timestamp ties (ADVICE r6) —
    * today every deadline comparison is strict so ties cannot change the
    * emitted state, but the parity argument should not depend on that.
    */
  def funnelStream(
      events: org.apache.spark.sql.Dataset[(Long, Long, Long, String)],
      stepUs: Long): org.apache.spark.sql.Dataset[StageReached] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[StageReached]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, tpe) =>
            tpe match {
              case "view" if st.tView < 0 =>
                st = st.copy(tView = us); out += StageReached(user, 1, us)
              case "click" if st.tClick < 0 && st.tView >= 0 &&
                  us > st.tView && us <= st.tView + stepUs =>
                st = st.copy(tClick = us); out += StageReached(user, 2, us)
              case "purchase" if st.tPurchase < 0 && st.tClick >= 0 &&
                  us > st.tClick && us <= st.tClick + stepUs =>
                st = st.copy(tPurchase = us); out += StageReached(user, 3, us)
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
