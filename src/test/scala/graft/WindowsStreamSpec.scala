package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Windows

/** Streaming hopping windows ([[Windows.hoppingCounts]]): cells finalized by
  * the watermark must equal the batch aggregation over the same events —
  * the streaming twin of `q_hopping_window`, and each cell must emit
  * exactly once (append mode drops the cell's state after emission).
  */
class WindowsStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("watermark-finalized hopping cells equal the batch grid, emitted once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, dir)
      .selectExpr("unix_micros(ts) AS us", "event_type")
      .as[(Long, String)].collect().sortBy(_._1)
    val maxUs = events.map(_._1).max
    // flush event 2h past the end: watermark (flush − 30 min) clears every
    // original window end (max + 1 h), so all original cells finalize; the
    // flush's own windows stay open and must NOT emit
    val flushUs = maxUs + 2L * 3600 * 1000000
    val in = MemoryStream[(Long, String)]
    val src = in.toDF().toDF("us", "event_type")
      .select(expr("timestamp_micros(us)").as("ts"), col("event_type"))
    val q = Windows.hoppingCounts(src).writeStream
      .format("memory").queryName("hop_out").outputMode("append").start()
    try {
      val half = events.length / 2
      in.addData(events.slice(0, half).toSeq); q.processAllAvailable()
      in.addData(events.slice(half, events.length).toSeq); q.processAllAvailable()
      in.addData(Seq((flushUs, "flush"))); q.processAllAvailable()
      val got = spark.table("hop_out").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = Tables.events(spark, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(expr("unix_micros(window.start)").as("ws"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(want.nonEmpty)
      assert(got === want,
        s"finalized cells diverge from batch: ${ (want.toSet -- got.toSet).take(3) } missing, " +
          s"${ (got.toSet -- want.toSet).take(3) } extra")
      // exactly-once: no (ws, type) cell appears twice in the append output
      val dupes = spark.table("hop_out").groupBy("ws", "event_type").count()
        .filter($"count" > 1).count()
      assert(dupes == 0, "a finalized cell emitted more than once")
    } finally q.stop()
  }
}
