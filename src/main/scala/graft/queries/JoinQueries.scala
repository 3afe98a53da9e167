package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators over the `events` table: as-of join (attribution)
  * and banded range join (context windows) — the two joins a training-data /
  * telemetry pipeline needs that Spark has no native operator for, each
  * re-expressed as a shuffle-on-key plan instead of the inequality join a
  * naive translation would produce. Generalizes the reference's
  * "latest snapshot per key" merge semantics (pet_scraper.py:410-466) from
  * key-equality to key+time.
  *
  * Scale posture (100 TB):
  *  - The as-of join is the union-tag trick: tag both sides, ONE shuffle on
  *    `user_id`, one per-user ordered window carrying the last build-side row
  *    forward. No inequality join ever exists in the plan — Spark would
  *    execute one as BroadcastNestedLoopJoin (probe × build per user would be
  *    quadratic). Window partitions by `user_id`, never global.
  *  - The range join is band-bucketing: probes explode to the 3 adjacent
  *    fixed-width time buckets, the join is a hash equi-join on
  *    (user_id, bucket), and the exact ±window predicate filters after. Probe
  *    amplification is a constant 3×; bucket population is bounded by per-user
  *    event rate × band width, not corpus size.
  *
  * Oracle parity: all time math is integer microseconds (`unix_micros`, same
  * truncation DuckDB applies to the nanos parquet column — the q_sessionize
  * precedent). The as-of oracle is DuckDB's native ASOF JOIN, a genuinely
  * independent implementation of the semantics; the range oracle is the plain
  * inequality join DuckDB executes as IEJoin.
  */
object JoinQueries {

  /** Range-join band width and match radius: ±5 minutes, in microseconds.
    * Radius == band width, so bucket b only ever matches b-1, b, b+1.
    */
  private val BandUs = 300L * 1000000

  /** events with integer-microsecond timestamps — shared probe/build base. */
  private def ev(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("us", expr("unix_micros(ts)"))

  val queries: Seq[GraftQuery] = Seq(

    // J5 as-of join: each purchase attributed to the same user's most recent
    // view at-or-before it (NULL columns when the user never viewed before
    // buying). Views are pre-collapsed to one row per (user_id, us) — max
    // event_id wins — so the "latest" pick is total-ordered and both engines
    // agree on ties.
    GraftQuery(
      "q_asof_join",
      "purchases as-of joined to the latest prior view per user",
      (s, dir) => {
        val e = ev(s, dir)
        // collapse views to one per (user_id, us) — max event_id wins — so
        // the operator's unique-(key, ts) build-side contract holds and both
        // engines agree on same-instant ties
        val views = e.filter(col("event_type") === "view")
          .groupBy("user_id", "us").agg(max("event_id").as("v_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us"), col("event_id").as("p_id"))
        graft.operators.Relational.asofJoin(purchases, views, "user_id", "us")
          .select(
            col("p_id").as("event_id"), col("user_id"), col("us").as("p_us"),
            col("asof_v_id").as("view_event_id"), col("asof_us").as("view_us"),
            (col("us") - col("asof_us")).as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
             |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
             |v AS (
             |  SELECT user_id, us, max(event_id) AS view_event_id
             |  FROM ev WHERE event_type = 'view' GROUP BY 1, 2),
             |p AS (
             |  SELECT event_id, user_id, us FROM ev WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, p.us AS p_us,
             |       v.view_event_id, v.us AS view_us, p.us - v.us AS gap_us
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.user_id AND v.us <= p.us
             |ORDER BY p.event_id""".stripMargin)
    ),

    // J6 banded range join: how many non-error events the same user produced
    // within ±5 minutes of each error — the "context window" count an
    // incident / data-quality pipeline attaches to every anomaly. Errors with
    // no nearby activity are kept at 0 (left join back to the probe side).
    GraftQuery(
      "q_range_join",
      "per-error count of same-user non-error events within +/-5 minutes",
      (s, dir) => {
        val e = ev(s, dir)
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("us").as("e_us"))
        val others = e.filter(col("event_type") =!= "error")
          .select(col("user_id"), col("us").as("o_us"),
            expr(s"us div ${BandUs}L").as("bkt"))
        val probes = errors.withColumn("bkt",
          explode(array(
            expr(s"e_us div ${BandUs}L - 1"),
            expr(s"e_us div ${BandUs}L"),
            expr(s"e_us div ${BandUs}L + 1"))))
        val counts = probes
          .join(others, Seq("user_id", "bkt"))
          .filter(col("o_us").between(col("e_us") - BandUs, col("e_us") + BandUs))
          .groupBy("event_id").agg(count(lit(1)).as("n_nearby"))
        errors
          .join(counts, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("n_nearby"), lit(0L)).as("n_nearby"))
          .orderBy("event_id")
      },
      Some(s"""WITH ev AS (
              |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type FROM events),
              |e AS (
              |  SELECT event_id, user_id, us FROM ev WHERE event_type = 'error'),
              |o AS (
              |  SELECT user_id, us FROM ev WHERE event_type <> 'error')
              |SELECT e.event_id, e.user_id, count(o.us) AS n_nearby
              |FROM e LEFT JOIN o
              |  ON e.user_id = o.user_id
              | AND o.us BETWEEN e.us - ${BandUs} AND e.us + ${BandUs}
              |GROUP BY 1, 2 ORDER BY e.event_id""".stripMargin)
    ),

    // J6 snapshot reconciliation via FULL OUTER join — the one join class
    // the rest of the surface never exercises (inner/left/semi/anti all
    // graded elsewhere): given two versions of a keyed table, classify every
    // key as added / removed / changed / same — THE table-diff audit behind
    // incremental publishing (the graded relational twin of
    // `KeyedTable.diff`'s store-level version compare). The two snapshots
    // derive deterministically from `documents`: v1 drops doc_id % 7 == 0,
    // v2 drops doc_id % 11 == 0 and bumps n_chars on doc_id % 5 == 0 — so
    // all four statuses occur and both engines build identical inputs.
    //
    // Scale shape: ONE co-partitioned shuffle join on the key (both sides
    // hash to the same exchange; at deployment two bucketed snapshots join
    // with no exchange at all), null-flag classification is row-local, and
    // the only other exchange is the output sort. The classification CASE
    // tests side-presence flags, not nullable payloads — a null payload
    // column in a PRESENT row must not read as "absent".
    GraftQuery(
      "q_snapshot_diff",
      "full-outer keyed diff of two derived snapshots: added/removed/changed/same",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val v1 = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"), col("n_chars").as("old_chars"), lit(1L).as("in_old"))
        val v2 = docs.filter(col("doc_id") % 11 =!= 0)
          .select(col("doc_id"),
            (col("n_chars") + when(col("doc_id") % 5 === 0, 1L).otherwise(0L)).as("new_chars"),
            lit(1L).as("in_new"))
        v1.join(v2, Seq("doc_id"), "full")
          .select(col("doc_id"),
            when(col("in_old").isNull, "added")
              .when(col("in_new").isNull, "removed")
              .when(col("old_chars") =!= col("new_chars"), "changed")
              .otherwise("same").as("status"),
            col("old_chars"), col("new_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, n_chars AS old_chars FROM documents WHERE doc_id % 7 <> 0),
             |v2 AS (
             |  SELECT doc_id,
             |         n_chars + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS new_chars
             |  FROM documents WHERE doc_id % 11 <> 0)
             |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             |       CASE WHEN v1.doc_id IS NULL THEN 'added'
             |            WHEN v2.doc_id IS NULL THEN 'removed'
             |            WHEN v1.old_chars <> v2.new_chars THEN 'changed'
             |            ELSE 'same' END AS status,
             |       v1.old_chars, CAST(v2.new_chars AS BIGINT) AS new_chars
             |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
             |ORDER BY doc_id""".stripMargin)
    )
  )
}
