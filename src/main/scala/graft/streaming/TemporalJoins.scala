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
}
