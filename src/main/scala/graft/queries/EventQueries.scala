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
    )
  )
}
