package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of the batch temporal joins (SURVEY.md §2.11 E4b/E4c):
  * Spark's native stream-stream interval join — two watermarked streams
  * joined on key equality plus an event-time range condition.
  *
  * The watermark + time-range pair is what makes this runnable unbounded:
  * each side's join state is evicted as soon as the other side's watermark
  * proves no future row can still land inside the interval, so state is
  * bounded by (event rate × (watermark delay + window)), not by stream
  * length. Without the range condition Spark would have to keep EVERY past
  * row forever (and rejects the query in append mode).
  */
object TemporalJoins {

  /** Inner interval join: (probe row, build row) for every pair with equal
    * `key` and `buildTs` within ±`window` of `probeTs`. Works unchanged on
    * batch frames (watermarks are no-ops there), which is how the spec
    * cross-checks it against the brute force.
    */
  def intervalJoin(probe: DataFrame, build: DataFrame, key: String,
      probeTs: String, buildTs: String,
      window: String = "5 minutes", watermark: String = "10 minutes"): DataFrame = {
    val p = probe.withWatermark(probeTs, watermark)
    val b = build.withWatermark(buildTs, watermark)
    p.join(b,
      p(key) === b(key) &&
        b(buildTs) >= p(probeTs) - expr(s"INTERVAL $window") &&
        b(buildTs) <= p(probeTs) + expr(s"INTERVAL $window"))
      .drop(b(key))
  }

  /** Per-key buffers of the as-of state: probes not yet provably final, and
    * the build rows that could still be some probe's latest-at-or-before
    * (all builds above the watermark, plus AT MOST ONE at-or-below it — any
    * older build is dominated for every present and future probe).
    */
  final case class AsofState(probes: Seq[(Long, Long)], builds: Seq[(Long, Long)])

  /** One as-of match: the probe row plus the latest build row at-or-before
    * it (None when no build precedes the probe).
    */
  final case class AsofMatch(key: Long, probe_id: Long, probe_us: Long,
      build_id: Option[Long], build_us: Option[Long])

  /** Streaming as-of join (the event-time stateful form of the batch
    * `Relational.asofJoin`): each probe is emitted EXACTLY when the
    * watermark proves its answer final — a build row with an earlier
    * event-time can keep arriving (out of order) until the watermark passes
    * the probe's timestamp, so eager emission would be wrong, and this
    * operator is deliberately a pure function of (admitted rows, watermark),
    * like [[Sessions.sessionizeEventTime]].
    *
    * Both inputs are (key, event time, row id). State per key is bounded by
    * the watermark horizon: pending probes and builds leave state as the
    * watermark passes them (builds collapse to the single dominating
    * at-or-below-watermark row).
    */
  def asofStream(
      probe: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, Long)],
      build: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, Long)],
      watermark: String = "10 minutes"): org.apache.spark.sql.Dataset[AsofMatch] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import probe.sparkSession.implicits._
    val tagged = probe.toDF("key", "ts", "id").withColumn("is_probe", lit(true))
      .unionByName(build.toDF("key", "ts", "id").withColumn("is_probe", lit(false)))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Long, Boolean)]
    tagged
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Boolean)],
            state: GroupState[AsofState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(AsofState(Nil, Nil))
          val (newProbes, newBuilds) = rows.toSeq.partition(_._4)
          val probes = prev.probes ++ newProbes.map(r => (Sessions.micros(r._2), r._3))
          val builds = prev.builds ++ newBuilds.map(r => (Sessions.micros(r._2), r._3))
          // a probe is final once the watermark passes it strictly (a build
          // with ts == probe ts is not late yet, so <= would emit early)
          val (ripe, pending) = probes.partition(_._1 < wmUs)
          // merge scan (ADVICE r5): builds sorted once per invocation, one
          // cursor advanced as the (also sorted) ripe probes ascend —
          // O((probes + builds) log builds), not O(probes × builds). The
          // dominating build for probe ts is the LAST sorted element with
          // build ts <= probe ts (ascending (ts, id) order puts the
          // largest-id tie last, identical to max over the filtered seq).
          val sb = builds.sorted.toIndexedSeq
          var j = 0
          val out = ripe.sorted.iterator.map { case (pUs, pId) =>
            while (j < sb.length && sb(j)._1 <= pUs) j += 1
            if (j == 0) AsofMatch(key, pId, pUs, None, None)
            else { val b = sb(j - 1); AsofMatch(key, pId, pUs, Some(b._2), Some(b._1)) }
          }
          // builds at-or-below the watermark collapse to the dominating one,
          // which is retained indefinitely: a future probe (ts >= wm) may
          // still match it. O(keys) retained state is the honest as-of
          // semantics — the same "latest snapshot per key" a KeyedTable
          // holds; there is no correct way to forget a key's latest build.
          val (liveB, oldB) = builds.partition(_._1 >= wmUs)
          val keptBuilds = (if (oldB.nonEmpty) Seq(oldB.max) else Nil) ++ liveB
          if (pending.isEmpty && keptBuilds.isEmpty) state.remove()
          else {
            state.update(AsofState(pending, keptBuilds))
            // wake when the watermark can first ripen a pending probe or
            // retire a live build; must sit strictly above the current wm
            val nextUs = (pending.map(_._1) ++ liveB.map(_._1)) match {
              case Nil => Nil; case xs => Seq(xs.min)
            }
            nextUs.foreach(us => state.setTimeoutTimestamp(
              math.max(us / 1000L + 1L, state.getCurrentWatermarkMs() + 1L)))
          }
          out
      }
  }
}
