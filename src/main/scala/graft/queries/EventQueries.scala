package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** E4 sessionization (SURVEY.md §2.11) over the `events` table: gap-based
  * sessions — a new session starts when a user's inter-event gap exceeds the
  * threshold. The batch analog of Structured Streaming's `session_window`
  * (the streaming form lives in graft.streaming).
  *
  * Scale posture (100 TB): both windows partition by `user_id` — the natural
  * key of the computation — so every stage is parallel across users; the
  * aggregation is partial before its exchange. Gap math is integer
  * microseconds (exact in both engines; no timestamp-format parity risk).
  */
object EventQueries {

  /** Session gap threshold: 30 minutes, in microseconds. */
  private val GapUs = 30L * 60 * 1000000

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_sessionize",
      "gap-based sessions per user (30-min threshold): events, start, end",
      (s, dir) => {
        val order  = Seq(col("us").asc, col("event_id").asc)
        val wLag   = Window.partitionBy(col("user_id")).orderBy(order: _*)
        val wCum   = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("us", expr("unix_micros(ts)"))
          .withColumn("prev_us", lag(col("us"), 1).over(wLag))
          .withColumn("new_session",
            when(col("prev_us").isNull || col("us") - col("prev_us") > GapUs, 1L)
              .otherwise(0L))
          .withColumn("session_idx", sum(col("new_session")).over(wCum))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("us")).as("start_us"),
            max(col("us")).as("end_us"))
          .orderBy("user_id", "session_idx")
      },
      Some(s"""SELECT user_id, session_idx, count(*) AS n_events,
              |       min(us) AS start_us, max(us) AS end_us
              |FROM (
              |  SELECT user_id, event_id, us,
              |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
              |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
              |  FROM (
              |    SELECT user_id, event_id, us,
              |           CASE WHEN prev_us IS NULL OR us - prev_us > $GapUs THEN 1 ELSE 0 END AS new_session
              |    FROM (
              |      SELECT user_id, event_id, epoch_us(ts) AS us,
              |             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
              |      FROM events) l) f) g
              |GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin)
    ),

    // E4d time-series gap-fill: per-user hourly event counts with MISSING
    // HOURS zero-filled — the resample/date-spine operation every
    // observability and rate-monitoring query needs (a count query alone
    // silently omits the empty buckets, which are usually the signal).
    // The spine is GENERATED per user from its own [min, max] hour span
    // (`sequence` + explode — rows are produced executor-side, never
    // shuffled in), then left-joined against the per-(user, hour) counts on
    // the same key the counts already shuffle on. Spine size is bounded by
    // users × stream horizon in hours — independent of event volume.
    GraftQuery(
      "q_gap_fill",
      "per-user hourly counts with zero-filled gap hours",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("hr"))
        val counts = ev.groupBy("user_id", "hr").agg(count(lit(1)).as("n"))
        val spine = ev.groupBy("user_id")
          .agg(min("hr").as("h0"), max("hr").as("h1"))
          .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
        spine.join(counts, Seq("user_id", "hr"), "left")
          .select(col("user_id"), col("hr"), coalesce(col("n"), lit(0L)).as("n_events"))
          .orderBy("user_id", "hr")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr FROM events),
             |c AS (SELECT user_id, hr, count(*) AS n FROM ev GROUP BY 1, 2),
             |s AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1 FROM ev GROUP BY 1),
             |spine AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM s)
             |SELECT spine.user_id, spine.hr, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
             |FROM spine LEFT JOIN c USING (user_id, hr)
             |ORDER BY user_id, hr""".stripMargin)
    )
  )
}
