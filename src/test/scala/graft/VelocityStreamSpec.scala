package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Velocity

/** Streaming rolling window ([[Velocity.velocityStream]]): the per-event
  * trailing-24h counts/sums folded through keyed state must, on a
  * time-ordered feed whose batches keep same-instant runs whole, equal the
  * batch RANGE-framed query row for row — including the all-peers-in-frame
  * rule on timestamp ties and the state eviction across batch boundaries.
  */
class VelocityStreamSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val DayUs = 24L * 3600 * 1000000

  test("time-ordered streamed events reproduce the batch rolling window exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "cast(round(value * 100) as bigint) AS cents")
      .as[(Long, Long, Long, Long)]
      .collect()
      .sortBy(r => (r._2, r._3))
    // batch boundaries may not split a same-us run (the documented
    // contract): advance each cut to the end of its run
    val cuts = Seq(events.length / 3, 2 * events.length / 3).map { c =>
      var k = c
      while (k > 0 && k < events.length && events(k)._2 == events(k - 1)._2) k += 1
      k
    }
    val batches = Seq(
      events.slice(0, cuts.head), events.slice(cuts.head, cuts.last),
      events.slice(cuts.last, events.length)).filter(_.nonEmpty)
    val in = MemoryStream[(Long, Long, Long, Long)]
    // explicit None: the unbounded variant — these parity tests replay a
    // historic feed whose event time has nothing to do with wall time, and
    // they need `processAllAvailable` to settle (registered processing-time
    // timeouts busy-loop no-data batches under the default trigger — see
    // the velocityStream scaladoc). The bounded DEFAULT is pinned by the
    // idle-eviction test below.
    val q = Velocity.velocityStream(in.toDS(), DayUs, None).writeStream
      .format("memory").queryName("velocity_out").outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("velocity_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
      val want = SparkEntry.queries("q_rolling_window")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
      assert(want.nonEmpty)
      assert(got.size === want.length, "row-count drift vs the batch window")
      val diffs = want.filter { case (id, n, c) => got.get(id) != Some((n, c)) }
      assert(diffs.isEmpty, s"first mismatches: ${diffs.take(5).mkString(", ")}")
    } finally q.stop()
  }

  test("a cross-batch straggler neither poisons later rows nor reads the frontier totals") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, Long)]
    val q = Velocity.velocityStream(in.toDS(), windowUs = 50L, None).writeStream
      .format("memory").queryName("velocity_straggler").outputMode("append").start()
    try {
      // batch 1 establishes frontier ts=100; batch 2 delivers a straggler
      // (ts=10, behind the frontier) and a conforming event (ts=120)
      in.addData((1L, 100L, 1L, 7L)); q.processAllAvailable()
      in.addData((1L, 10L, 2L, 3L), (1L, 120L, 3L, 5L)); q.processAllAvailable()
      val got = spark.table("velocity_straggler").collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
      // the straggler's own window [-40, 10] holds only itself — NOT the
      // whole-deque frontier totals
      assert(got(2L) === ((1L, 3L)), s"straggler window drifted: $got")
      // the conforming event's window [70, 120] is {100, 120}: the aged
      // straggler must have been evicted despite arriving after ts=100 —
      // an append-at-tail fold would leave it stuck behind the head and
      // count 3 here
      assert(got(3L) === ((2L, 12L)), s"straggler poisoned a later row: $got")
    } finally q.stop()
  }

  test("keyed state survives a query RESTART from checkpoint") {
    // the stronger recovery claim: stop the query entirely after the first
    // half, start a NEW query on the same checkpoint, feed the second half —
    // second-half outputs depend on first-half windows, so they are only
    // correct if the state store restored. Sink is foreachBatch into an
    // idempotent event_id-keyed map (foreachBatch is at-least-once across
    // restarts; replayed rows overwrite with identical values).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "cast(round(value * 100) as bigint) AS cents")
      .as[(Long, Long, Long, Long)]
      .collect()
      .sortBy(r => (r._2, r._3))
    var cut = events.length / 2
    while (cut > 0 && cut < events.length && events(cut)._2 == events(cut - 1)._2) cut += 1
    val ckpt = java.nio.file.Files.createTempDirectory("graft-velockpt").toString
    val state = new scala.collection.concurrent.TrieMap[Long, (Long, Long)]
    val in = MemoryStream[(Long, Long, Long, Long)]
    def start() = Velocity.velocityStream(in.toDS(), DayUs, None).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Velocity.VelocityRow], _: Long) =>
        df.collect().foreach(r => state.put(r.event_id, (r.n_24h, r.cents_24h)))
      }
      .start()
    val q1 = start()
    try { in.addData(events.slice(0, cut).toSeq); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { in.addData(events.slice(cut, events.length).toSeq); q2.processAllAvailable() }
    finally q2.stop()
    val want = SparkEntry.queries("q_rolling_window")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(state.size === want.length, "row-count drift after restart")
    val diffs = want.filter { case (id, n, c) => state.get(id) != Some((n, c)) }
    assert(diffs.isEmpty,
      s"state did not restore across restart; first mismatches: ${diffs.take(5).mkString(", ")}")
  }

  test("DEFAULT-constructed stream drops idle state and recreates it on the next event") {
    // VERDICT r9 #4: with no idleTimeoutMs argument the stream must have
    // BOUNDED state — a user idle past 2× the window is evicted (observed
    // through the state-operator row count), and their next event rebuilds
    // the window from empty, which is exactly the correct trailing window
    // for rows that stale. No processAllAvailable here: with a
    // processing-time timeout registered the engine keeps scheduling
    // no-data batches (that is HOW the eviction fires without fresh input),
    // so progress is polled with a deadline instead.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val windowUs = 1000000L // 1 s window => default idle timeout 2 s
    val rows = new scala.collection.concurrent.TrieMap[Long, (Long, Long)]
    val in = MemoryStream[(Long, Long, Long, Long)]
    val q = Velocity.velocityStream(in.toDS(), windowUs).writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Velocity.VelocityRow], _: Long) =>
        df.collect().foreach(r => rows.put(r.event_id, (r.n_24h, r.cents_24h)))
      }
      .start()
    def awaitUntil(what: String)(cond: => Boolean): Unit = {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
      assert(cond, s"timed out waiting for: $what")
    }
    def stateRows(): Long =
      // guard the array: early progress records (before the state operator
      // reports) carry an EMPTY stateOperators (StreamingSmoke hit this)
      Option(q.lastProgress).filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
    try {
      // batch 1: two events for user 1 inside one window -> state 1 key
      in.addData((1L, 1000000L, 101L, 100L), (1L, 1500000L, 102L, 25L))
      awaitUntil("batch-1 rows emitted")(rows.contains(102L))
      assert(rows(102L) === ((2L, 125L)), "in-window trailing count before eviction")
      // idle past the 2 s default timeout: the no-data batches the timeout
      // registration schedules fire the eviction with NO new input
      awaitUntil("idle user 1 evicted from the state store")(stateRows() == 0L)
      // user 1 returns 10 windows later: state recreates from empty, and
      // that IS the correct trailing window (the old rows are long stale)
      in.addData((1L, 11000000L, 103L, 40L))
      awaitUntil("post-eviction event emitted")(rows.contains(103L))
      assert(rows(103L) === ((1L, 40L)),
        "recreated window must contain only the new event")
    } finally q.stop()
  }
}
