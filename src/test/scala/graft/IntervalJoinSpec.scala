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
