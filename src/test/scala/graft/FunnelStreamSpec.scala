package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Funnels

/** Streaming funnel ([[Funnels.funnelStream]]): stage transitions tracked in
  * keyed state must, on a time-ordered feed, reproduce the batch query's
  * per-user stage timestamps exactly; replays and cross-batch state carry
  * must behave.
  */
class FunnelStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val dir    = "/root/testdata/sf0.001"
  private val StepUs = graft.queries.EventQueries.StepUs

  test("time-ordered streamed events reproduce the batch funnel stages") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .as[(Long, Long, Long, String)]
      .collect()
      .sortBy(r => (r._2, r._3))
    val in = MemoryStream[(Long, Long, Long, String)]
    val q = Funnels.funnelStream(in.toDS(), StepUs).writeStream
      .format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      events.grouped(math.max(1, events.length / 3 + 1)).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      def streamed(u: Long, stage: Int) = got.getOrElse((u, stage), -1L)
      val want = SparkEntry.queries("q_funnel_steps")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(want.nonEmpty)
      val diffs = want.filter { case (u, tv, tc, tp) =>
        streamed(u, 1) != tv || streamed(u, 2) != tc || streamed(u, 3) != tp
      }
      assert(diffs.isEmpty, s"first mismatches: ${diffs.take(5).mkString(", ")}")
      // each (user, stage) fires at most once even across batches
      val counts = spark.table("funnel_out").groupBy("user_id", "stage").count()
        .filter($"count" > 1).count()
      assert(counts == 0, "a stage transition emitted twice")
    } finally q.stop()
  }
}
