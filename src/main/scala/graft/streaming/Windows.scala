package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of the E4l hopping-window aggregate (`q_hopping_window`):
  * the same 1-hour/15-minute grid computed incrementally over an unbounded
  * stream — Structured Streaming's canonical windowed aggregation, with the
  * watermark bounding state: a (window, type) cell lives in the state store
  * only until the watermark passes the window end, then emits EXACTLY ONCE
  * (append mode) and is dropped. State is O(open windows × types), never
  * O(stream).
  *
  * Parity contract (WindowsStreamSpec): cells emitted for fully-watermarked
  * windows equal the batch aggregation over the same events — the grid is
  * epoch-aligned integer arithmetic on both paths, so there is nothing
  * order-dependent to disagree on; late events inside the watermark horizon
  * still land in their (open) windows, later ones are dropped by the
  * standard watermark contract.
  */
object Windows {

  /** events must carry `ts` (timestamp) and `event_type`. */
  def hoppingCounts(
      events: DataFrame,
      width: String = "1 hour",
      slide: String = "15 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_micros(window.start)").as("ws"),
        col("event_type"), col("n"))
}
