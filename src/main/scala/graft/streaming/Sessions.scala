package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of E4 sessionization (SURVEY.md §2.11): Spark's native
  * `session_window` with a watermark — the event-time generalization of the
  * batch lag/cumulative-gap query (`q_sessionize`). Works unchanged on batch
  * frames (no watermark needed), which is how the spec cross-checks it
  * against the batch form.
  *
  * Boundary semantics differ from the batch query by one ulp of the gap: a
  * follower exactly `gap` later starts a new session here (window is
  * half-open [t, t+gap)) but continues the session in the lag-based form
  * (`diff > gap` starts new). Irrelevant for real event streams; documented
  * for exactness.
  */
object Sessions {

  def sessionize(events: DataFrame, tsCol: String = "ts", userCol: String = "user_id",
      gap: String = "30 minutes", watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    src
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_event"),
        max(col(tsCol)).as("last_event"))
      .select(col(userCol), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_events"),
        col("first_event"), col("last_event"))
  }
}
