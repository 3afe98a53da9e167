package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.TemporalJoins

/** Stream-stream interval join ([[TemporalJoins.intervalJoin]]) — the
  * streaming form of the graded banded range join (q_range_join): matches
  * must appear exactly when both sides have arrived and the ±window predicate
  * holds, across micro-batch boundaries, and the plan must carry the
  * watermark-driven state eviction that bounds it on unbounded streams.
  */
class IntervalJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("interval join matches the brute force on a batch frame") {
    val errors = Seq((1L, 10L, ts("10:00:00")), (2L, 10L, ts("12:00:00")),
      (3L, 11L, ts("10:02:00"))).toDF("e_id", "user_id", "e_ts")
    val others = Seq((100L, 10L, ts("10:04:59")), (101L, 10L, ts("10:05:01")),
      (102L, 11L, ts("10:00:00")), (103L, 12L, ts("10:00:00")))
      .toDF("o_id", "user_id", "o_ts")
    val got = TemporalJoins.intervalJoin(errors, others, "user_id", "e_ts", "o_ts")
      .select("e_id", "o_id").as[(Long, Long)].collect().toSet
    // (1,100): +4:59 in window; (1,101): +5:01 out; (3,102): -2:00 in window;
    // user 12 never probes; error 2 has nothing within ±5min
    assert(got == Set((1L, 100L), (3L, 102L)))
  }

  test("stream-stream: matches emit across micro-batch boundaries") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probes = MemoryStream[(Long, Long, Timestamp)]
    val builds = MemoryStream[(Long, Long, Timestamp)]
    val joined = TemporalJoins.intervalJoin(
      probes.toDF().toDF("e_id", "user_id", "e_ts"),
      builds.toDF().toDF("o_id", "user_id", "o_ts"),
      "user_id", "e_ts", "o_ts")
    val q = joined.selectExpr("e_id", "o_id").writeStream
      .format("memory").queryName("ij_out").outputMode("append").start()
    try {
      // build side arrives FIRST, its probe only in the next batch — the
      // match must still emit (state carried the build row across batches)
      builds.addData((100L, 10L, ts("10:01:00")))
      q.processAllAvailable()
      assert(spark.table("ij_out").count() == 0)
      probes.addData((1L, 10L, ts("10:03:00")))
      builds.addData((101L, 10L, ts("10:07:00")), (102L, 10L, ts("10:09:00")))
      q.processAllAvailable()
      val got = spark.table("ij_out").as[(Long, Long)].collect().toSet
      // 100 (-2min) and 101 (+4min) in window; 102 (+6min) out
      assert(got == Set((1L, 100L), (1L, 101L)))
    } finally q.stop()
  }

  test("asofStream: out-of-order builds are honored; probes emit only when provably final") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val probes = MemoryStream[(Long, Timestamp, Long)]
    val builds = MemoryStream[(Long, Timestamp, Long)]
    val joined = TemporalJoins.asofStream(probes.toDS(), builds.toDS(), "10 minutes")
    val q = joined.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    def got() = spark.table("asof_out")
      .as[TemporalJoins.AsofMatch].collect().toSet
    try {
      // probe arrives FIRST; an earlier-event-time build lands in a LATER
      // micro-batch — eager emission would have answered B0, the watermark
      // form must answer B1
      builds.addData((10L, ts("09:59:00"), 100L))
      probes.addData((10L, ts("10:00:10"), 1L))
      probes.addData((11L, ts("10:00:20"), 2L)) // key with no builds at all
      q.processAllAvailable()
      assert(got().isEmpty, "nothing may emit before the watermark passes the probes")
      builds.addData((10L, ts("10:00:05"), 101L))
      q.processAllAvailable()
      assert(got().isEmpty)
      // push the watermark past both probes (10:20 - 10min = 10:10)
      builds.addData((99L, ts("10:20:00"), 999L))
      q.processAllAvailable()
      def us(t: Timestamp) = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      assert(got() == Set(
        TemporalJoins.AsofMatch(10L, 1L, us(ts("10:00:10")), Some(101L), Some(us(ts("10:00:05")))),
        TemporalJoins.AsofMatch(11L, 2L, us(ts("10:00:20")), None, None)))
      // a probe AFTER the watermark passed old builds still sees the
      // retained dominating build for its key
      probes.addData((10L, ts("10:15:00"), 3L))
      builds.addData((99L, ts("10:40:00"), 998L)) // advance wm past 10:15
      q.processAllAvailable()
      assert(got().exists(m => m.probe_id == 3L && m.build_id.contains(101L)),
        s"retained latest build lost: ${got()}")
    } finally q.stop()
  }

  test("asofStream matches the batch brute force under random interleaving (seeded)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // ~40 events over 3 keys within one hour, split randomly into 6 batches;
    // event times and arrival order are deliberately uncorrelated
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      (1L + rnd.nextInt(3), ts(f"10:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), idBase + i)
    }
    val allProbes = mk(20, 1000L)
    val allBuilds = mk(20, 2000L)
    val probes = MemoryStream[(Long, Timestamp, Long)]
    val builds = MemoryStream[(Long, Timestamp, Long)]
    // delay exceeds the whole event span, so no arrival is ever late-dropped
    // and the test isolates the BUFFERING logic: every event is admitted in
    // arbitrary order, everything stays pending until the sentinel flush
    // (late-DROP semantics are Spark's own admission filter, not this
    // operator's logic)
    val q = TemporalJoins.asofStream(probes.toDS(), builds.toDS(), "2 hours")
      .writeStream.format("memory").queryName("asof_rand").outputMode("append").start()
    try {
      val pB = rnd.shuffle(allProbes).grouped(4).toSeq
      val bB = rnd.shuffle(allBuilds).grouped(4).toSeq
      pB.zipAll(bB, Seq.empty, Seq.empty).foreach { case (ps, bs) =>
        if (ps.nonEmpty) probes.addData(ps)
        if (bs.nonEmpty) builds.addData(bs)
        q.processAllAvailable()
      }
      // sentinel far in the future flushes every pending probe
      builds.addData((99L, ts("23:00:00"), 9999L))
      q.processAllAvailable()
      def us(t: Timestamp) = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      val want = allProbes.map { case (k, pTs, pId) =>
        val prior = allBuilds.filter(b => b._1 == k && us(b._2) <= us(pTs))
        if (prior.isEmpty) TemporalJoins.AsofMatch(k, pId, us(pTs), None, None)
        else {
          val best = prior.maxBy(b => (us(b._2), b._3))
          TemporalJoins.AsofMatch(k, pId, us(pTs), Some(best._3), Some(us(best._2)))
        }
      }.toSet
      val got = spark.table("asof_rand").as[TemporalJoins.AsofMatch].collect().toSet
      assert(got == want,
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    } finally q.stop()
  }

  test("the streaming plan carries watermarks on both join inputs (bounded state)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probes = MemoryStream[(Long, Long, Timestamp)]
    val builds = MemoryStream[(Long, Long, Timestamp)]
    val joined = TemporalJoins.intervalJoin(
      probes.toDF().toDF("e_id", "user_id", "e_ts"),
      builds.toDF().toDF("o_id", "user_id", "o_ts"),
      "user_id", "e_ts", "o_ts")
    val wm = "EventTimeWatermark".r
      .findAllIn(joined.queryExecution.analyzed.toString).length
    assert(wm == 2, "both streams must be watermarked or join state grows unboundedly")
  }
}
