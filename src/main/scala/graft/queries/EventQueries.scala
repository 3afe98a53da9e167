package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational

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

  /** Funnel step deadline: each stage must follow the previous within 24h
    * (sized so every stage of the test corpus's funnel discriminates:
    * 150 → 60 → 25 users at sf0.01). Shared with the streaming form's
    * parity spec — the two must test the same deadline.
    */
  private[graft] val StepUs = 24L * 3600 * 1000000

  /** Stage width the skew report sizes salt fan-outs against — see the
    * q_skew_report doc for why 256.
    */
  private val SaltTasks = 256L

  /** One day in microseconds — the rolling-window RANGE frame width. */
  private val DayUs = 24L * 3600 * 1000000

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
    ),

    // E4e ordered funnel (sequence-pattern matching): per user, the first
    // view, the first click STRICTLY AFTER that view, and the first purchase
    // strictly after that click — each within a 24h step deadline. The
    // MATCH_RECOGNIZE-class analytics operator, computed the distributed
    // way: two stacked RUNNING MINs over one user-keyed sort (first_view so
    // far → qualifying-click so far) turn the sequential pattern into plain
    // window algebra — no per-user UDAF state, no re-scan per step, and the
    // whole user's history never leaves its partition. A k-step funnel is k
    // stacked window columns over the SAME sort (one exchange, one sort).
    //
    // Timestamps stay -1-coalesced integers (a NULL would be the one value
    // the two engines could hash differently); stage = steps reached.
    GraftQuery(
      "q_funnel_steps",
      "view -> click -> purchase funnel per user, 24h step deadlines",
      (s, dir) => {
        val order = Seq(col("us").asc, col("event_id").asc)
        val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("us", expr("unix_micros(ts)"))
          .select(col("user_id"), col("event_id"), col("us"), col("event_type"))
          .withColumn("first_view",
            min(when(col("event_type") === "view", col("us"))).over(w))
          .withColumn("click_ok",
            when(col("event_type") === "click" && col("us") > col("first_view") &&
              col("us") <= col("first_view") + StepUs, col("us")))
          .withColumn("first_click", min(col("click_ok")).over(w))
          .groupBy("user_id")
          .agg(
            min(when(col("event_type") === "view", col("us"))).as("t_view"),
            min(col("click_ok")).as("t_click"),
            min(when(col("event_type") === "purchase" && col("us") > col("first_click") &&
              col("us") <= col("first_click") + StepUs, col("us"))).as("t_purchase"))
          .select(col("user_id"),
            coalesce(col("t_view"), lit(-1L)).as("t_view"),
            coalesce(col("t_click"), lit(-1L)).as("t_click"),
            coalesce(col("t_purchase"), lit(-1L)).as("t_purchase"),
            (when(col("t_purchase").isNotNull, 3L)
              .when(col("t_click").isNotNull, 2L)
              .when(col("t_view").isNotNull, 1L)
              .otherwise(0L)).as("stage"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
              |f AS (
              |  SELECT user_id, event_type, event_id, us,
              |         min(CASE WHEN event_type = 'view' THEN us END) OVER w AS first_view
              |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
              |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              |g AS (
              |  SELECT *, CASE WHEN event_type = 'click' AND us > first_view
              |                  AND us <= first_view + $StepUs THEN us END AS click_ok
              |  FROM f),
              |h AS (
              |  SELECT user_id, event_type, us, click_ok,
              |         min(click_ok) OVER w AS first_click
              |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
              |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              |u AS (
              |  SELECT user_id,
              |         min(CASE WHEN event_type = 'view' THEN us END) AS t_view,
              |         min(click_ok) AS t_click,
              |         min(CASE WHEN event_type = 'purchase' AND us > first_click
              |                   AND us <= first_click + $StepUs THEN us END) AS t_purchase
              |  FROM h GROUP BY user_id)
              |SELECT user_id, coalesce(t_view, -1) AS t_view,
              |       coalesce(t_click, -1) AS t_click,
              |       coalesce(t_purchase, -1) AS t_purchase,
              |       CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
              |                 WHEN t_click IS NOT NULL THEN 2
              |                 WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
              |FROM u ORDER BY user_id""".stripMargin)
    ),

    // E4f join-key skew report: the pre-join diagnostic a 100 TB pipeline
    // runs before shuffling on a key — the top heavy keys, their share of
    // the table, and the salt fan-out that would level each one against a
    // SaltTasks-wide stage (salt_n = ceil(cnt·SaltTasks/total): replicas
    // needed so one key's rows spread to averagely-loaded partitions; 1 =
    // no salting needed). SaltTasks = 256 — a plausible wide-stage width,
    // and large enough that the test corpus's heaviest keys (~0.9% share)
    // exercise the salting branch rather than reporting a vacuous all-1
    // column. AQE handles sort-merge skew reactively; this is the proactive
    // report that drives key-salting and broadcast decisions.
    //
    // Scale shape: one partial-aggregated keyed count (the histogram every
    // skew decision needs anyway), a 1-row totals broadcast, and a
    // TakeOrderedAndProject top-10 — nothing at corpus cardinality after
    // the first aggregate.
    GraftQuery(
      "q_skew_report",
      "top-10 heaviest join keys with share (bp) and suggested salt fan-out",
      (s, dir) => {
        val counts = Tables.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        val tot = counts.agg(sum(col("cnt")).as("total"))
        counts.crossJoin(broadcast(tot))
          .select(col("user_id"), col("cnt"),
            expr("(cnt * 10000) div total").as("share_bp"),
            // the same formula autoSalted executes — the report IS the
            // join's planning input (Relational.saltFanoutSql)
            expr(Relational.saltFanoutSql("cnt", "total", SaltTasks)).as("salt_n"))
          .orderBy(col("cnt").desc, col("user_id").asc)
          .limit(10)
      },
      Some(s"""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
              |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
              |SELECT user_id, cnt, (cnt * 10000) // total AS share_bp,
              |       greatest(1, (cnt * $SaltTasks + total - 1) // total) AS salt_n
              |FROM c, t ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin)
    ),

    // E4g the skew join itself, graded: autoSalted(events ⋈ per-user dim)
    // must produce EXACTLY the rows of the plain inner equi-join the oracle
    // runs — DuckDB knows nothing about salting, so any error in the
    // fan-out map, the position-mod spread, or the small-side replication
    // (a key joined 0× or 2× per salt) breaks the hash, not just a spec.
    // The small side is the per-user event count — the natural "user
    // features" dim a behavioral pipeline joins against its event log, and
    // the same histogram q_skew_report tops.
    //
    // Scale shape: one keyed partial-agg histogram inside autoSalted (≤
    // SaltTasks heavy keys broadcast), the join shuffles on (user_id,
    // salt) — a hot user's rows land in salt_n tasks instead of one — and
    // the downstream per-type aggregate is partial before its exchange.
    GraftQuery(
      "q_salted_join",
      "autoSalted events ⋈ per-user totals, aggregated per event type",
      (s, dir) => {
        val ev = Tables.events(s, dir).select("user_id", "event_type")
        val userDim = ev.groupBy("user_id").agg(count(lit(1)).as("user_events"))
        Relational.autoSalted(ev, userDim, "user_id", SaltTasks)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("user_events").as("weight"))
          .orderBy("event_type")
      },
      Some("""WITH d AS (SELECT user_id, count(*) AS user_events
             |           FROM events GROUP BY user_id)
             |SELECT e.event_type, count(*) AS n,
             |       CAST(sum(d.user_events) AS BIGINT) AS weight
             |FROM events e JOIN d USING (user_id)
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)
    ),

    // E4h cohort retention — THE product-analytics matrix: users bucketed
    // by the epoch-week of their FIRST event (cohort), then for every week
    // offset k, how many of that cohort were active — the curve every
    // engagement/churn analysis reads. Weeks are epoch-based
    // (us div 7·86400·1e6), not calendar date_trunc: integer arithmetic on
    // the shared unix_micros basis, so both engines agree without touching
    // week-start / timezone semantics at all.
    //
    // Scale shape: one user-keyed aggregate for first-event weeks, one
    // user-keyed equi-join back onto events (both sides shuffle on
    // user_id — the natural co-partitioning), a distinct at (cohort, k,
    // user) grain, one aggregate; cohort sizes are a tiny broadcast join.
    // Retention reported in integer basis points (n·10000 div cohort size).
    GraftQuery(
      "q_cohort_retention",
      "weekly cohort retention matrix: first-event-week cohorts x week offset, users + bp",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"))
        val first = ev.groupBy("user_id").agg(min(col("wk")).as("cohort"))
        val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
        ev.join(first, "user_id")
          .select(col("cohort"), (col("wk") - col("cohort")).as("k"), col("user_id"))
          .distinct()
          .groupBy("cohort", "k").agg(count(lit(1)).as("n_users"))
          .join(broadcast(sizes), "cohort")
          .withColumn("retained_bp", expr("(n_users * 10000L) div cohort_users"))
          .select("cohort", "k", "n_users", "cohort_users", "retained_bp")
          .orderBy("cohort", "k")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id),
             |sz AS (SELECT cohort, count(*) AS cohort_users FROM f GROUP BY cohort),
             |act AS (SELECT DISTINCT f.cohort, e.wk - f.cohort AS k, e.user_id
             |        FROM ev e JOIN f USING (user_id)),
             |ret AS (SELECT cohort, k, count(*) AS n_users
             |        FROM act GROUP BY cohort, k)
             |SELECT r.cohort, r.k, r.n_users, s.cohort_users,
             |       (r.n_users * 10000) // s.cohort_users AS retained_bp
             |FROM ret r JOIN sz s USING (cohort)
             |ORDER BY cohort, k""".stripMargin)
    ),

    // E4j event-time rolling window — the RANGE-framed window class nothing
    // else in the suite exercises (every other window is ROWS-framed or
    // grouped): at each event, how many events and how much value (exact
    // integer cents) the SAME user produced in the PRECEDING 24 HOURS OF
    // EVENT TIME — the per-entity rate/velocity feature behind fraud
    // scoring and rate-limiting. ROWS frames count physical rows; only a
    // RANGE frame over the microsecond axis expresses "last 24 hours"
    // (sparse users keep small windows, bursty users large ones, and
    // same-instant peers are ALL in frame on both engines — RANGE includes
    // order-value peers, which is what makes ties deterministic here with
    // no extra tiebreak column).
    //
    // Scale shape: one user-keyed exchange + one in-partition sort carries
    // both window columns; Spark's running RANGE frame evaluates in O(n)
    // per partition with two moving endpoints. Value is quantized to cents
    // BEFORE the frame sum (the A8 exact-money move) so the rolling sums
    // hash-match.
    GraftQuery(
      "q_rolling_window",
      "per-user preceding-24h event-time RANGE window: rolling count + exact cents",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-DayUs, 0)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(ts)").as("us"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
          .withColumn("n_24h", count(lit(1)).over(w))
          .withColumn("cents_24h", sum(col("cents")).over(w))
          .select("event_id", "user_id", "us", "n_24h", "cents_24h")
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, us,
              |       CAST(count(*) OVER w AS BIGINT) AS n_24h,
              |       CAST(sum(cents) OVER w AS BIGINT) AS cents_24h
              |FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
              |             CAST(round(value * 100) AS BIGINT) AS cents
              |      FROM events) e
              |WINDOW w AS (PARTITION BY user_id ORDER BY us
              |             RANGE BETWEEN $DayUs PRECEDING AND CURRENT ROW)
              |ORDER BY event_id""".stripMargin)
    ),

    // E4k ordered-argument aggregates — the argmax/argmin aggregate class
    // (max_by/min_by ↔ DuckDB arg_max/arg_min) nothing else in the suite
    // exercises: per user, the event_type of their FIRST and LAST event plus
    // the activity span — the entity-profile feature (acquisition channel,
    // latest action) that would otherwise need a full window sort. As an
    // AGGREGATE it partial-aggregates: each map task keeps one (key, value)
    // candidate pair per user, the exchange carries user-count rows, and no
    // per-user event history is ever sorted — the window formulation of the
    // same question shuffles every event.
    //
    // Determinism: max_by/arg_max tie-break is engine-undefined, so the
    // ordering key must be UNIQUE — (us, event_id) packed as a fixed-width
    // zero-padded string (lexicographic ≡ numeric on non-negative ints;
    // us·10⁶+event_id would overflow bigint). event_id is unique, so no tie
    // exists and both engines pick the same row.
    //
    // Physical note: min_by/max_by buffers hold a (value, key) pair, which
    // UnsafeRow cannot mutate in place, so Spark plans SortAggregate rather
    // than HashAggregate — still PARTIAL-aggregated (PlanShapeSpec pins
    // partial_min_by/partial_max_by), so the exchange carries user-count
    // rows; the in-partition sort on the group key is the standard price of
    // argmax over immutable buffers, not a scale hazard.
    GraftQuery(
      "q_first_last",
      "per-user first/last event via max_by/min_by ordered-arg aggregates",
      (s, dir) => {
        val k = concat(lpad(col("us").cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 12, "0"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("event_id"),
            expr("unix_micros(ts)").as("us"))
          .withColumn("k", k)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            min_by(col("event_type"), col("k")).as("first_type"),
            min(col("us")).as("first_us"),
            max_by(col("event_type"), col("k")).as("last_type"),
            max(col("us")).as("last_us"))
          .withColumn("span_us", col("last_us") - col("first_us"))
          .select("user_id", "n_events", "first_type", "first_us",
            "last_type", "last_us", "span_us")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |       arg_min(event_type, k) AS first_type,
             |       CAST(min(us) AS BIGINT) AS first_us,
             |       arg_max(event_type, k) AS last_type,
             |       CAST(max(us) AS BIGINT) AS last_us,
             |       CAST(max(us) - min(us) AS BIGINT) AS span_us
             |FROM (SELECT user_id, event_type, epoch_us(ts) AS us,
             |             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
             |             lpad(CAST(event_id AS VARCHAR), 12, '0') AS k
             |      FROM events) e
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)
    ),

    // E4l hopping (sliding) time windows — Spark's built-in `window(ts, w,
    // s)` generator, the overlapping-window aggregate class nothing else
    // grades (E4j's RANGE frame is per-ROW trailing; this is the fixed
    // GRID of overlapping windows — the "events per type per hour, updated
    // every 15 min" dashboard feed, and the batch twin of the streaming
    // windowed-aggregation idiom). Each event expands to exactly w/s = 4
    // epoch-aligned windows (Spark's Expand runs below the partial
    // aggregate, so the shuffle carries (window, type) cells, not 4×
    // events); window starts are multiples of the slide, so boundaries are
    // exact integer microseconds both engines derive identically — the
    // oracle rebuilds the same 4 memberships per event from integer div.
    GraftQuery(
      "q_hopping_window",
      "per-type counts over 1h windows hopping every 15min (window() generator)",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(expr("unix_micros(window.start)").as("ws"),
            col("event_type"), col("n"))
          .orderBy("ws", "event_type"),
      Some("""WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events)
             |SELECT ws, event_type, count(*) AS n
             |FROM (SELECT ((us // 900000000) - k) * 900000000 AS ws, event_type
             |      FROM e, range(0, 4) t(k))
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    // E4i hourly spike/drop detection — the z-score anomaly monitor that
    // complements q_ks_drift (distribution shift) and q_silence_runs (gaps):
    // per event type, which hours' counts sit ≥ 2 population standard
    // deviations from that type's own hourly mean. The grid is the observed
    // hour spine CROSS the type set (zero hours COUNT — a dropped-to-zero
    // hour is usually the alert), exactly the ks_drift spine pattern.
    //
    // All arithmetic is EXACT integers via the z² identity: with per-type
    // hour count n, sum s, sum-of-squares ss over the grid, population
    // z²(x) = (x·n − s)² / (n·ss − s²) — both sides integer, so the |z| ≥ 2
    // flag is the integer comparison (x·n − s)² ≥ 4·(n·ss − s²) and the
    // reported magnitude z²·10⁴ is one exact `div` (monotone in |z|; no
    // sqrt, no Welford-vs-naive float drift between engines). Long range:
    // (x·n)² caps at ~(hourly-count · #hours)² — at 100 TB widen the sums
    // to DECIMAL(38,0) before squaring, same plan shape.
    //
    // Scale shape: one (type, hour) partial aggregate over the corpus, a
    // per-type 1-row moment aggregate over the tiny grid, broadcast back —
    // nothing downstream of the first aggregate touches O(corpus) rows.
    GraftQuery(
      "q_zscore_anomaly",
      "hours ≥ 2 population std-devs from each event type's hourly mean (exact z² bp)",
      (s, dir) => anomalyReport(hourlyCounts(Tables.events(s, dir))),
      Some("""WITH cnt AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |grid AS (
             |  SELECT g.event_type, g.hr, CAST(coalesce(cnt.c, 0) AS BIGINT) AS x
             |  FROM (SELECT t.event_type, p.hr
             |        FROM (SELECT DISTINCT event_type FROM cnt) t,
             |             (SELECT DISTINCT hr FROM cnt) p) g
             |  LEFT JOIN cnt ON cnt.event_type = g.event_type AND cnt.hr = g.hr),
             |m AS (
             |  SELECT event_type, count(*) AS n, sum(x) AS s, sum(x * x) AS ss
             |  FROM grid GROUP BY event_type)
             |SELECT g.event_type, g.hr, g.x AS cnt,
             |       CAST((g.x * m.n - m.s) * (g.x * m.n - m.s) * 10000
             |            // (m.n * m.ss - m.s * m.s) AS BIGINT) AS z2_bp,
             |       CAST(sign(g.x * m.n - m.s) AS BIGINT) AS direction
             |FROM grid g JOIN m USING (event_type)
             |WHERE m.n * m.ss - m.s * m.s > 0
             |  AND (g.x * m.n - m.s) * (g.x * m.n - m.s) >= 4 * (m.n * m.ss - m.s * m.s)
             |ORDER BY event_type, hr""".stripMargin)
    )
  )

  /** Per-(event_type, hour) event counts — the only corpus-sized stage of
    * the z-score monitor, split out so the streaming store
    * ([[graft.streaming.Sketches.updateHourly]]) merges exactly these rows
    * by addition and the two forms cannot drift on the hour basis.
    */
  private[graft] def hourlyCounts(events: DataFrame): DataFrame =
    events.select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("c"))

  /** Max (event_type, hr) rows [[anomalyReport]] will hold as a driver-side
    * local relation: ~32 B/row → a few MB at the ceiling, far under any
    * driver heap, while a century of hourly buckets × 100 event types
    * (~88M rows) safely overflows to the lazy path.
    */
  private[graft] val AnomalyLocalCeiling = 100000

  /** The anomaly report over an (event_type, hr, c) count table — see the
    * q_zscore_anomaly doc for the exact-integer z² construction. Shared by
    * the graded query and the streaming store's report side.
    */
  private[graft] def anomalyReport(cnt0: DataFrame): DataFrame =
    anomalyReport(cnt0, AnomalyLocalCeiling)

  /** [[anomalyReport]] with an explicit local-relation ceiling — the spec's
    * handle for exercising the overflow (lazy) path on a small input; the
    * production default is [[AnomalyLocalCeiling]].
    */
  private[graft] def anomalyReport(cnt0: DataFrame, ceiling: Int): DataFrame = {
    // The count table is referenced by four branches (spine, types, the grid
    // left-join probe, and — through grid — both the moments and report
    // sides). It is the OUTPUT of the only corpus-sized aggregate, bounded
    // by #event_types × #hours — a function of the time span, not the data
    // volume — so it is collected ONCE and rebuilt as a local relation: the
    // branches then share driver-held rows with no recomputation and no
    // cache. This replaces the r8 persist, which was never unpersisted and
    // leaked one cached RDD per call into any LIBRARY caller (streaming
    // anomaliesOf) that doesn't run the graded runners' cache sweep
    // (ADVICE r8). The collect is gated by a row ceiling (ADVICE r9: an
    // unbounded collect turns a library operator into a driver-memory
    // hazard on a wide-enough time span): up to [[AnomalyLocalCeiling]]
    // rows take the local-relation fast path; past it the operator stays a
    // fully lazy plan over `cnt0` — each of the four branches recomputes
    // the count aggregate, so callers at that scale should pass a
    // persisted `cnt0` (documented here; the graded query's grid is ~10³
    // rows, nowhere near the ceiling).
    val s = cnt0.sparkSession
    import s.implicits._
    val typed = cnt0.select(
      col("event_type").cast("string"), col("hr").cast("long"),
      col("c").cast("long"))
    val probe = typed.as[(String, Long, Long)].take(ceiling + 1)
    val cnt =
      if (probe.length <= ceiling) probe.toSeq.toDF("event_type", "hr", "c")
      else typed.toDF("event_type", "hr", "c")
    val spine = cnt.select("hr").distinct()
    val types = cnt.select("event_type").distinct()
    val grid = types.crossJoin(spine)
      .join(cnt, Seq("event_type", "hr"), "left")
      .withColumn("x", coalesce(col("c"), lit(0L)))
    val moments = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(expr("x * x")).as("ss"))
    grid.join(broadcast(moments), "event_type")
      .withColumn("dev", expr("x * n - s"))
      .withColumn("varn", expr("n * ss - s * s")) // n²·var ≥ 0
      .filter(expr("varn > 0 AND dev * dev >= 4 * varn"))
      .select(col("event_type"), col("hr"), col("x").as("cnt"),
        expr("(dev * dev * 10000) div varn").as("z2_bp"),
        signum(col("dev")).cast("bigint").as("direction"))
      .orderBy("event_type", "hr")
  }
}
