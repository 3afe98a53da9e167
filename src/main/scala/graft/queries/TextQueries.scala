package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** E3 text-analysis family (SURVEY.md §2.11; BASELINE north star): corpus
  * statistics, language-ID, quality scoring, token counting, and document
  * fingerprinting over the `documents` table — the per-document profiling
  * stage of an LLM training-data pipeline, generalizing the reference's
  * per-field quality gates (pet_scraper.py:364-407).
  *
  * Scale posture (100 TB): the E3a–E3e profiling queries are horizontal
  * per-row expression pipelines (whole-stage-codegen'd built-ins, no UDFs)
  * followed by at most one hash-partitioned groupBy on a low-cardinality
  * key — the canonical map-side-combine shape, no windows or joins. The
  * E3f–E3h additions (sketch / sample / heavy hitters) each add at most one
  * keyed window or small join, always partitioned by the group key. No
  * driver state anywhere.
  *
  * Oracle parity: scores are integer counts or integer-threshold CASE
  * buckets; the one float computation (the KMV estimate) goes through
  * `floor`, which has no half-way ties for engines to disagree on
  * (SURVEY.md §7.4#2).
  */
object TextQueries {

  import Dialect.{duckGramsSql, duckHash60Sql, duckWordsSql, hash60Sql, wordsSql}

  /** Per-language marker ("stopword") lists for the n-gram/stopword language
    * heuristic. Tiny on purpose: at scale these are broadcast literals inside
    * codegen, not a join.
    */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "des"))

  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
  private def scoreSql(ws: Seq[String]) =
    s"size(filter(words, w -> w in (${inList(ws)})))"
  private def duckScoreSql(ws: Seq[String]) =
    s"len(list_filter(words, w -> w IN (${inList(ws)})))"

  /** BPE-ish tokenizer regex: letter runs, digit runs, or any single
    * non-alphanumeric-non-space symbol (the pre-tokenization split most BPE
    * vocabularies apply before merges).
    */
  private val TokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Phrase probes for the positional-index search (E3ag): two common
    * bigram phrases, one trigram (exercises generic length), one absent
    * phrase (must yield zero rows, not zero-count rows). Single-sourced —
    * the Spark token table AND the oracle's comprehension branches both
    * derive from this list.
    */
  private val Phrases: Seq[String] =
    Seq("table hash", "customer join", "slow hash batch", "graft spark engine")

  /** PII-scrub patterns, in the Java∩RE2 regex common subset (no
    * backslash classes, no lookarounds) so Spark and the DuckDB oracle
    * match identically. A deployment extends the list; the plan shape
    * (per-row replace-all chain) is unchanged.
    */
  private val EmailRe = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
  private val PhoneRe = "555-[0-9]{4}"

  /** Chunking geometry: window of [[ChunkW]] tokens advanced by stride
    * [[ChunkS]] (overlap = W − S tokens keeps boundary context in both
    * neighbors — the standard retrieval-embedding split). Sized so the test
    * corpus's ~60-word docs produce multiple chunks; a deployment sets its
    * embedder's window here.
    */
  private[graft] val ChunkW = 32L
  private[graft] val ChunkS = 24L

  /** Vocabulary size for the OOV-coverage audit — tiny on purpose (the
    * synthetic corpus has a small closed vocabulary, so a realistic 32k
    * vocab would make every token in-vocab and the query vacuous); a
    * deployment sets its tokenizer's true size here.
    */
  private val VocabK = 16

  /** Context-window token budget for the sequence-packing query — sized so
    * the test corpus yields multiple packs per source; a deployment sets its
    * model's context length here.
    */
  private[graft] val PackBudget = 1024L

  /** Top-k depth of the vocabulary coverage curve (q_vocab_coverage): the
    * CovK most frequent words get rank + running coverage; bounded, so the
    * cumsum runs on a constant-size frame at any corpus size.
    */
  private val CovK = 30

  /** Exact-df ceiling of the document-frequency histogram
    * (q_df_histogram): df values above this pool into one overflow bucket
    * (df-threshold tuning cares about the small-df shape; the heavy tail
    * only needs its mass).
    */
  private val DfCap = 32L

  /** Shard fan-out for the deterministic training-order shuffle — the
    * parallel unit of the two-level (shard, in-shard rank) global order. A
    * deployment sizes this to its reader parallelism (shards stay
    * independent at any corpus size).
    */
  private val NShards = 8L

  /** Gopher-rule thresholds (q_gopher_rules), corpus-scaled — the synthetic
    * docs run ~10–110 words from a ~40-word vocabulary; the paper's
    * production values are 50..100k words and a 20% top-word cap.
    * Constants, not data-derived: the rule battery must stay one scan.
    */
  private val GopherMinWords = 20L
  private val GopherMaxWords = 100L
  private val GopherTopMilli = 125L

  /** Count-min sketch geometry: depth = independent salted hash rows
    * (error probability delta = e^-D), width = counters per row (error
    * eps = e/W of the total count).
    */
  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 64L

  /** The CmsDepth salted (row, bucket) hash expressions over a word column
    * `w` — single-sourced for the graded query and the streaming
    * [[graft.streaming.Sketches]] merge (a drifting salt would silently
    * split a word's counters across cells).
    */
  private[graft] def cmsBucketExprs: Seq[org.apache.spark.sql.Column] =
    (0 until CmsDepth).map(r =>
      expr(s"${hash60Sql(s"concat('cms$r:', w)")} % $CmsWidth"))

  /** Linear-counting estimates m·ln(m/V), pre-evaluated for every possible
    * zero-register count V ∈ [1, 64]: V is a bounded small integer, so the
    * whole correction is 64 constants — both engines index the SAME literal
    * table and neither ever runs a transcendental (the floor-log2 skeleton
    * the other log-shaped queries use would quantize ln to whole bits,
    * i.e. ×2 steps — useless for an estimator whose whole point in this
    * range is fine granularity). `StrictMath.log` (not `math.log`) pins
    * the constants to fdlibm bit-for-bit on every JVM, so the literals in
    * the plan and in the generated oracle SQL can never drift by platform.
    */
  private[graft] val HllLcTable: Seq[Long] =
    (1 to 64).map(v => math.round(64.0 * StrictMath.log(64.0 / v)))

  /** Raw-estimator floor of HLL's calibrated range: below/at 5m/2 = 160
    * with zero registers present, the raw harmonic estimator is known-
    * biased and linear counting over the zero-register count is the
    * estimator (Flajolet et al. 2007 §4; SketchesSpec pins both branches).
    */
  private[graft] val HllLcThreshold = 160L

  val queries: Seq[GraftQuery] = Seq(

    // E3a corpus statistics: chars/words per document, aggregated per
    // language. One partial-aggregated shuffle on a 5-value key.
    GraftQuery(
      "q_text_stats",
      "per-language corpus stats: docs, chars, words, longest doc",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("n_words", expr(s"size($wordsSql)"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            sum(col("n_words")).as("total_words"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("lang"),
      Some(s"""SELECT lang, count(*) AS n_docs,
              |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
              |       CAST(sum(len($duckWordsSql)) AS BIGINT) AS total_words,
              |       max(n_chars) AS max_chars
              |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    ),

    // E3b language-ID heuristic: score each document against per-language
    // marker-word lists, predict by first-wins argmax, and emit the
    // lang × predicted confusion matrix. Pure horizontal scoring + one tiny
    // groupBy — the 100 TB language-distribution scan.
    GraftQuery(
      "q_lang_id",
      "stopword-marker language-ID confusion matrix (true lang x predicted)",
      (s, dir) => {
        val scored = Tables.documents(s, dir)
          .withColumn("words", expr(wordsSql))
          .withColumn("s_de", expr(scoreSql(Markers(0)._2)))
          .withColumn("s_en", expr(scoreSql(Markers(1)._2)))
          .withColumn("s_es", expr(scoreSql(Markers(2)._2)))
          .withColumn("s_fr", expr(scoreSql(Markers(3)._2)))
          .withColumn("pred", expr(
            """CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
              |     WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
              |     WHEN s_es >= s_fr THEN 'es'
              |     ELSE 'fr' END""".stripMargin))
        scored.groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred")
      },
      Some(s"""SELECT lang, pred, count(*) AS n FROM (
              |  SELECT lang,
              |         CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
              |              WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
              |              WHEN s_es >= s_fr THEN 'es'
              |              ELSE 'fr' END AS pred
              |  FROM (SELECT lang,
              |               ${duckScoreSql(Markers(0)._2)} AS s_de,
              |               ${duckScoreSql(Markers(1)._2)} AS s_en,
              |               ${duckScoreSql(Markers(2)._2)} AS s_es,
              |               ${duckScoreSql(Markers(3)._2)} AS s_fr
              |        FROM (SELECT lang, $duckWordsSql AS words FROM documents) w) sc) p
              |GROUP BY lang, pred ORDER BY lang, pred""".stripMargin)
    ),

    // E3c quality scoring: integer signal counts (words, stopword hits,
    // punctuation, all-caps words) bucketed by integer-threshold rules — the
    // heuristic quality gate (reference analog: should_skip_pet's >=50%
    // missing rule, pet_scraper.py:387-405). No float math → exact parity.
    GraftQuery(
      "q_quality_score",
      "integer quality signals + keep/short/lowsignal bucket per document",
      (s, dir) => {
        val allStops = Markers.flatMap(_._2).distinct
        Tables.documents(s, dir)
          .withColumn("words", expr(wordsSql))
          .withColumn("n_words", expr("cast(size(words) as bigint)"))
          .withColumn("stop_hits", expr(s"cast(${scoreSql(allStops)} as bigint)"))
          .withColumn("punct_hits",
            expr("cast(length(text) - length(regexp_replace(text, '[.,;:!?]', '')) as bigint)"))
          .withColumn("caps_words", expr("cast(size(filter(words, w -> w = upper(w) AND w <> lower(w))) as bigint)"))
          .withColumn("quality", expr(
            """CASE WHEN n_words < 30 THEN 'short'
              |     WHEN stop_hits * 10 < n_words THEN 'lowsignal'
              |     ELSE 'keep' END""".stripMargin))
          .select("doc_id", "n_words", "stop_hits", "punct_hits", "caps_words", "quality")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_words, stop_hits, punct_hits, caps_words,
              |       CASE WHEN n_words < 30 THEN 'short'
              |            WHEN stop_hits * 10 < n_words THEN 'lowsignal'
              |            ELSE 'keep' END AS quality
              |FROM (SELECT doc_id, len(words) AS n_words,
              |             ${duckScoreSql(Markers.flatMap(_._2).distinct)} AS stop_hits,
              |             length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_hits,
              |             len(list_filter(words, w -> w = upper(w) AND w <> lower(w))) AS caps_words
              |      FROM (SELECT doc_id, text, $duckWordsSql AS words FROM documents) w) q
              |ORDER BY doc_id""".stripMargin)
    ),

    // E3d token counting: whitespace tokens, BPE-ish pre-tokenizer matches,
    // and the chars/4 LLM budget estimate. Horizontal only.
    GraftQuery(
      "q_token_count",
      "whitespace / BPE-regex / chars-div-4 token counts per document",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("ws_tokens", expr(s"cast(size($wordsSql) as bigint)"))
          .withColumn("re_tokens", expr(s"cast(size(regexp_extract_all(coalesce(text, ''), '$TokenRe', 0)) as bigint)"))
          .withColumn("est_tokens", expr("cast((n_chars + 3) div 4 as bigint)"))
          .select("doc_id", "ws_tokens", "re_tokens", "est_tokens")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, len($duckWordsSql) AS ws_tokens,
              |       len(regexp_extract_all(coalesce(text, ''), '$TokenRe')) AS re_tokens,
              |       CAST((n_chars + 3) // 4 AS BIGINT) AS est_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // E3e document fingerprinting: polynomial rolling hash over per-word
    // 60-bit hashes, mod 1e9+7 (all intermediates < 2^63 → exact in both
    // engines). The content-defined fingerprint downstream incremental-dedup
    // layers key on.
    GraftQuery(
      "q_doc_fingerprint",
      "rolling polynomial hash fingerprint (mod 1e9+7) per document",
      (s, dir) =>
        // Single fold with a -1 sentinel standing in for "seed with the first
        // hash": each word is hashed exactly once (a slice/element_at
        // formulation would make Catalyst inline — and so re-evaluate — the
        // hash array once per reference). Hashes are in [0, 1e9+7) so the
        // sentinel is unambiguous, and the fold is identical to DuckDB's
        // first-element-seeded list_reduce.
        Tables.documents(s, dir)
          .withColumn("fingerprint", expr(
            s"aggregate($wordsSql, cast(-1 as bigint), (acc, w) -> " +
              s"if(acc < 0, ${hash60Sql("w")} % 1000000007, " +
              s"(acc * 31 + ${hash60Sql("w")} % 1000000007) % 1000000007))"))
          .select("doc_id", "fingerprint")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |       list_reduce([${duckHash60Sql("w")} % 1000000007
              |                    for w in $duckWordsSql],
              |                   (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // E3f KMV (k-minimum-values) distinct-count sketch: per-source distinct
    // words estimated from the K-th smallest 60-bit hash — est = (K−1) ·
    // 2^60 / h_K. THE cardinality-estimation pattern for 100 TB scans
    // (HLL's approx_count_distinct has engine-specific sketches, so it can
    // never hash-match an oracle; KMV over the shared deterministic hash60
    // is bit-identical in both engines). The exact distinct count rides
    // along, making the estimate's error visible in the graded output.
    //
    // Scale shape: one shuffle to dedup (source, h), one keyed window to
    // rank per source. A cluster deployment replaces the window with a
    // bounded min-K partial aggregate (merge = K smallest of both sides) —
    // same result, no per-source sort; the window form is kept here for
    // oracle parity in one expression.
    // K = 16 so the sketch branch actually fires on the test corpus (~31
    // distinct words per source — a production K of 256+ would always hit
    // the exact-fallback there and grade nothing).
    GraftQuery(
      "q_kmv_distinct",
      "KMV sketch: per-source distinct-word estimate from the 16th-smallest hash",
      (s, dir) => {
        val K = 16
        // distinct WORDS for the exact baseline (a 60-bit hash collision
        // must not deflate the very number the sketch is judged against);
        // distinct HASHES for the KMV slots; the empty token from splitting
        // blank text is not a word
        val words = Tables.documents(s, dir)
          .select(col("source"), explode(expr(s"array_distinct($wordsSql)")).as("w"))
          .filter(col("w") =!= "")
          .distinct()
        val exact = words.groupBy("source").agg(count(lit(1)).as("exact_distinct"))
        val hashes = words.select(col("source"), expr(hash60Sql("w")).as("h")).distinct()
        val ranked = hashes.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source")).orderBy(col("h"))))
        val kth = ranked.filter(col("rn") === K).select(col("source"), col("h").as("hk"))
        // floor, not round: floor of a double has no half-way ties, so the
        // two engines cannot disagree on the emitted integer
        exact.join(kth, Seq("source"), "left")
          .withColumn("est",
            when(col("hk").isNotNull,
              floor(lit((K - 1).toDouble) * lit(1152921504606846976.0) / col("hk").cast("double")))
              .otherwise(col("exact_distinct"))
              .cast("long"))
          .select("source", "exact_distinct", "est")
          .orderBy("source")
      },
      Some(s"""WITH w AS (
              |  SELECT DISTINCT source, w
              |  FROM (SELECT source, unnest(list_distinct($duckWordsSql)) AS w
              |        FROM documents) t
              |  WHERE w <> ''),
              |e AS (SELECT source, count(*) AS exact_distinct FROM w GROUP BY source),
              |h AS (SELECT DISTINCT source, ${duckHash60Sql("w")} AS h FROM w),
              |r AS (SELECT source, h,
              |             row_number() OVER (PARTITION BY source ORDER BY h) AS rn
              |      FROM h),
              |k AS (SELECT source, h AS hk FROM r WHERE rn = 16)
              |SELECT e.source, e.exact_distinct,
              |       CAST(CASE WHEN k.hk IS NOT NULL
              |                 THEN floor(15.0 * 1152921504606846976.0 / CAST(k.hk AS DOUBLE))
              |                 ELSE e.exact_distinct END AS BIGINT) AS est
              |FROM e LEFT JOIN k USING (source) ORDER BY e.source""".stripMargin)
    ),

    // E3ai HyperLogLog cardinality sketch (Flajolet et al. 2007) — the
    // CONSTANT-memory counterpart of E3f's KMV: m=64 registers per source,
    // each the max leading-zero rank of the hashes landing in its bucket.
    // Registers merge by MAX, which is what makes this THE distinct-count
    // sketch of a 1000-executor scan: every task sketches its split
    // independently, the merge is a 64-value max-combine per group (a
    // map-side partial aggregate here), and memory is 64 bytes per group
    // regardless of corpus size — KMV must keep k hashes AND ship them to
    // one reducer per group for the rank. Domain is distinct 3-gram
    // shingles per source (the corpus's high-cardinality column; its word
    // vocabulary is 31 tokens — linear-counting regime where the raw
    // estimator never exercises).
    //
    // Cross-engine exactness (why this can hash-match when Spark's own
    // approx_count_distinct never could — engine-specific sketch): bucket
    // j = h % 64, remainder v = h div 64 (54 bits); rho = 55 −
    // bit_length(v) with bit_length spelled length(bin(v)) — both engines
    // print minimal binary — and v = 0 ⇒ rho = 55; rho caps at 40 so the
    // harmonic mean computes in the integer scale 2^40 (sum ≤ 64·2^40 <
    // 2^47); alpha_64 = 0.709 enters as the rational 709/1000, making the
    // estimate ONE exact integer division (numerator 709·64²·2^40 < 2^62).
    // No floats anywhere; the exact twin and err_bp ride along
    // (sketch-error-visible, the E3f/E3q pattern). The small-range
    // linear-counting correction is CODE on both engine paths (the
    // [[HllLcTable]] literal lookup in hllEstimateFrom and the identical
    // CASE in the oracle SQL, VERDICT r9 #3); on this corpus n/m ≥ 19
    // keeps the raw estimator in its calibrated range, so the graded
    // output rides the raw branch — SketchesSpec exercises both.
    GraftQuery(
      "q_hll_distinct",
      "HLL(m=64) distinct-shingle estimate per source, integer-exact, beside the exact count",
      (s, dir) => {
        // distinct (source, shingle) — shared by the exact twin and the
        // sketch; deliberately not unpersisted (runner sweeps, see
        // DedupQueries note)
        val sh = hllShingles(Tables.documents(s, dir)).persist()
        val exact = sh.groupBy("source").agg(count(lit(1)).as("exact_distinct"))
        exact.join(hllEstimateFrom(hllRegistersOf(sh)), "source")
          .withColumn("err_bp",
            expr("abs(est - exact_distinct) * 10000L div exact_distinct"))
          .select("source", "exact_distinct", "n_zero", "est", "err_bp")
          .orderBy("source")
      },
      Some(s"""WITH w AS (
              |  SELECT source, $duckWordsSql AS words FROM documents),
              |shd AS (
              |  SELECT DISTINCT source, sh FROM (
              |    SELECT source,
              |           unnest([words[i] || ' ' || words[i+1] || ' ' || words[i+2]
              |                   for i in range(1, len(words) - 1)]) AS sh
              |    FROM w WHERE len(words) >= 3) t),
              |e AS (SELECT source, count(*) AS exact_distinct FROM shd GROUP BY source),
              |hh AS (SELECT DISTINCT source, ${duckHash60Sql("sh")} AS h FROM shd),
              |b AS (SELECT source, CAST(h % 64 AS INT) AS j, h // 64 AS v FROM hh),
              |r AS (SELECT source, j,
              |             max(least(CASE WHEN v = 0 THEN 55
              |                            ELSE 55 - length(bin(v)) END, 40)) AS r
              |      FROM b GROUP BY source, j),
              |sp AS (SELECT source,
              |              CAST(sum(1::BIGINT << (40 - r)) AS BIGINT)
              |                + (64 - count(*)) * 1099511627776 AS spow,
              |              CAST(64 - count(*) AS BIGINT) AS n_zero
              |       FROM r GROUP BY source),
              |raw AS (SELECT source, n_zero,
              |               (709 * 4096 * 1099511627776) // (1000 * spow) AS raw_est
              |        FROM sp),
              |est AS (SELECT source, n_zero,
              |               CAST(CASE WHEN n_zero > 0 AND raw_est <= $HllLcThreshold
              |                    THEN ${HllLcTable.mkString("[", ", ", "]")}[CAST(n_zero AS INT)]
              |                    ELSE raw_est END AS BIGINT) AS est
              |        FROM raw)
              |SELECT e.source, e.exact_distinct, est.n_zero, est.est,
              |       abs(est.est - e.exact_distinct) * 10000 // e.exact_distinct AS err_bp
              |FROM e JOIN est USING (source) ORDER BY e.source""".stripMargin)
    ),

    // E3g deterministic stratified sampling: keep a document iff its key
    // hash lands in a fixed bucket range — the reproducible subsampling /
    // data-mixing primitive of a training pipeline (rand()-based sampling
    // can't be replayed, audited, or oracle-matched; hash-bucket sampling
    // is stable across runs, engines, and cluster sizes). The sampling
    // itself is a pure codegen filter on the scan — embarrassingly
    // parallel, shuffle-free; the only exchange in the plan is the graded
    // output's mandatory global ORDER BY.
    GraftQuery(
      "q_hash_sample",
      "deterministic 5% sample: hash60(doc_id) % 100 < 5",
      (s, dir) =>
        Tables.documents(s, dir)
          .filter(expr(s"${hash60Sql("cast(doc_id as string)")} % 100") < 5)
          .select("doc_id", "source", "lang")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, source, lang FROM documents
              |WHERE ${duckHash60Sql("CAST(doc_id AS VARCHAR)")} % 100 < 5
              |ORDER BY doc_id""".stripMargin)
    ),

    // E3k deterministic per-stratum reservoir: exactly k docs per source,
    // picked by rank of a content-independent hash — the "N examples per
    // source for eval / human review" draw. Unlike the rate sample (E3g,
    // whose output grows with the stratum), the output here is k × #strata
    // regardless of corpus size. One window partitioned by source over
    // (hash, doc_id) — at 100 TB the rank only needs the per-stratum top-k,
    // which Spark's WindowGroupLimit pushes below the shuffle as a
    // per-partition top-k pre-filter (the same machinery as q_topk_per_group).
    GraftQuery(
      "q_stratified_sample",
      "deterministic fixed-k (10) per-source sample by hash rank",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(expr(hash60Sql("cast(doc_id as string)")).asc, col("doc_id").asc)
        Tables.documents(s, dir)
          .withColumn("rk", row_number().over(w).cast("bigint"))
          .filter(col("rk") <= 10)
          .select("source", "rk", "doc_id", "lang")
          .orderBy("source", "rk")
      },
      Some(s"""SELECT source, rk, doc_id, lang FROM (
              |  SELECT source, doc_id, lang,
              |         row_number() OVER (
              |           PARTITION BY source
              |           ORDER BY ${duckHash60Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
              |  FROM documents) t
              |WHERE rk <= 10 ORDER BY source, rk""".stripMargin)
    ),

    // E3m BM25-style top-k text retrieval: the IR scoring pipeline over the
    // corpus — exploded (doc, term) rows for the query terms only, tf / df /
    // doc-length aggregates, and the BM25 saturation formula with a RATIONAL
    // idf ((N+1)/(df+0.5), log-free): Spark and DuckDB guarantee correctly-
    // rounded +,*,/,sqrt but NOT ln, so a log idf could diverge by an ulp at
    // the rounding boundary. Per-term scores become fixed columns added in
    // one deterministic order (a float SUM's value depends on reduction
    // order); ranking is a global sort + LIMIT (TakeOrderedAndProject — the
    // scalable top-k, not a partition-less window). df and the (N, avgdl)
    // singleton are broadcast-sized by construction.
    GraftQuery(
      "q_bm25_topk",
      "BM25-ish (rational idf) top-10 docs for the query [hash join merge]",
      (s, dir) => {
        val terms = Seq("hash", "join", "merge")
        val docs = Tables.documents(s, dir)
          .withColumn("dl", expr(s"cast(size($wordsSql) as double)"))
        val toks = docs
          .select(col("doc_id"), col("dl"), explode(expr(wordsSql)).as("w"))
          .filter(col("w").isInCollection(terms))
        // df derives from tf (one row per (doc, term)) — a second aggregate
        // over the exploded token lineage would re-run the explode
        val tf = toks.groupBy("doc_id", "dl", "w").agg(count(lit(1)).cast("double").as("tf"))
        val df_ = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
        val stats = docs.agg(count(lit(1)).cast("double").as("nn"), avg("dl").as("avgdl"))
        val scored = tf
          .join(broadcast(df_), "w")
          .crossJoin(broadcast(stats))
          .withColumn("s",
            ((col("nn") + 1.0) / (col("df") + 0.5)) * (col("tf") * 2.2) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        val termCols = terms.map(t =>
          coalesce(max(when(col("w") === t, col("s"))), lit(0.0)).as(s"s_$t"))
        val perTerm = scored.groupBy("doc_id").agg(termCols.head, termCols.tail: _*)
        perTerm
          .withColumn("score_r",
            round(col("s_hash") + col("s_join") + col("s_merge"), 4))
          .select("doc_id", "score_r")
          .orderBy(col("score_r").desc, col("doc_id").asc)
          .limit(10)
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, CAST(len($duckWordsSql) AS DOUBLE) AS dl, text FROM documents),
              |toks AS (
              |  SELECT doc_id, dl, unnest($duckWordsSql) AS w
              |  FROM (SELECT doc_id, dl, text FROM docs) d),
              |m AS (SELECT doc_id, dl, w FROM toks WHERE w IN ('hash', 'join', 'merge')),
              |tf AS (SELECT doc_id, dl, w, CAST(count(*) AS DOUBLE) AS tf FROM m GROUP BY 1, 2, 3),
              |df AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
              |st AS (SELECT CAST(count(*) AS DOUBLE) AS nn, avg(dl) AS avgdl FROM docs),
              |sc AS (
              |  SELECT tf.doc_id,
              |         ((st.nn + 1.0) / (df.df + 0.5)) * (tf.tf * 2.2) /
              |           (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl)) AS s, tf.w
              |  FROM tf JOIN df USING (w), st),
              |pt AS (
              |  SELECT doc_id,
              |         coalesce(max(CASE WHEN w = 'hash'  THEN s END), 0.0) AS s_hash,
              |         coalesce(max(CASE WHEN w = 'join'  THEN s END), 0.0) AS s_join,
              |         coalesce(max(CASE WHEN w = 'merge' THEN s END), 0.0) AS s_merge
              |  FROM sc GROUP BY doc_id)
              |SELECT doc_id, round(s_hash + s_join + s_merge, 4) AS score_r
              |FROM pt ORDER BY score_r DESC, doc_id LIMIT 10""".stripMargin)
    ),

    // E3ag positional inverted-index phrase search — the IR primitive BM25
    // (bag-of-words scoring) cannot express: EXACT phrase occurrence. The
    // classic decomposition: explode documents into positional postings
    // (doc_id, pos, word), join against the tiny phrase-token table on the
    // WORD (broadcast — the join doubles as the filter, so only postings
    // whose word appears in some phrase survive into the aggregate), and
    // group by the ALIGNED ANCHOR pos − idx: a phrase of length L occurs at
    // anchor a iff all L (idx, word) slots matched — hits = L. Occurrences
    // per (phrase, doc) = anchor count. Generic in phrase length (the 3-word
    // probe exercises it); a repeated word inside a phrase just fans its
    // postings to both idx slots, each landing on its own anchor.
    //
    // Scale shape: postings are linear in corpus tokens and never shuffle as
    // raw text — the broadcast join prunes to phrase-vocabulary postings
    // BEFORE the only exchange (on (phrase, doc, anchor), cardinality =
    // matched postings). The oracle computes the same anchors as a DuckDB
    // per-row list comprehension — both sides single-sourced from Phrases.
    GraftQuery(
      "q_phrase_match",
      "positional-postings phrase search: anchor-aligned join, per-doc occurrence counts",
      (s, dir) => {
        import s.implicits._
        val pt = Phrases.flatMap { p =>
          val ws = p.split(' ')
          ws.zipWithIndex.map { case (w, i) => (p, i, w, ws.length) }
        }.toDF("phrase", "idx", "w", "plen")
        val post = Tables.documents(s, dir)
          .select(col("doc_id"), lower(col("text")).as("text"))
          .select(col("doc_id"), posexplode(expr(wordsSql)).as(Seq("pos", "w")))
        post.join(broadcast(pt), "w")
          .groupBy(col("phrase"), col("plen"), col("doc_id"),
            (col("pos") - col("idx")).as("anchor"))
          .agg(count(lit(1)).as("hits"))
          .filter(col("hits") === col("plen"))
          .groupBy("phrase", "doc_id")
          .agg(count(lit(1)).as("n_occ"))
          .select("phrase", "doc_id", "n_occ")
          .orderBy("phrase", "doc_id")
      },
      Some {
        val branches = Phrases.map { p =>
          val ws = p.split(' ')
          val conds = ws.zipWithIndex
            .map { case (w, i) => s"words[i+$i] = '$w'" }.mkString(" AND ")
          s"""SELECT '$p' AS phrase, doc_id,
             |       CAST(len([i FOR i IN range(1, len(words) - ${ws.length - 2}) IF $conds]) AS BIGINT) AS n_occ
             |FROM d""".stripMargin
        }
        s"""WITH d AS (
           |  SELECT doc_id,
           |         string_split_regex(trim(coalesce(lower(text), '')), ' +') AS words
           |  FROM documents),
           |hits AS (${branches.mkString("\n", "\nUNION ALL\n", "")})
           |SELECT phrase, doc_id, n_occ FROM hits WHERE n_occ > 0
           |ORDER BY phrase, doc_id""".stripMargin
      }
    ),

    // E3l weighted source mixing: per-source admission rates (the data-mix
    // weights of an LLM training run) applied as a deterministic hash
    // threshold, reported as target vs achieved mix. Shuffle-free up to the
    // tiny per-source aggregate: the admit decision is a codegen'd row
    // expression (salted so it draws independently of the E3g sample), and
    // the only exchange carries #sources rows. At 100 TB the weights table
    // would be a broadcast map — here a literal CASE, shared verbatim with
    // the oracle.
    GraftQuery(
      "q_source_mix",
      "per-source weighted admission (80/40/10%): target vs achieved mix",
      (s, dir) => {
        val rateSql = "CASE WHEN source = 'src0' THEN 80 WHEN source = 'src1' THEN 40 ELSE 10 END"
        Tables.documents(s, dir)
          .withColumn("rate_pct", expr(rateSql).cast("bigint"))
          .withColumn("admit",
            (expr(s"${hash60Sql("concat('mix:', cast(doc_id as string))")} % 100") <
              col("rate_pct")).cast("bigint"))
          .groupBy("source", "rate_pct")
          .agg(count(lit(1)).as("n_total"), sum("admit").as("n_admitted"))
          .withColumn("admit_bp", expr("(n_admitted * 10000) div n_total"))
          .orderBy("source")
      },
      Some(s"""SELECT source,
              |       CAST(CASE WHEN source = 'src0' THEN 80 WHEN source = 'src1' THEN 40 ELSE 10 END AS BIGINT) AS rate_pct,
              |       count(*) AS n_total,
              |       CAST(sum(CASE WHEN ${duckHash60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 100 <
              |                     (CASE WHEN source = 'src0' THEN 80 WHEN source = 'src1' THEN 40 ELSE 10 END)
              |                THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
              |       (CAST(sum(CASE WHEN ${duckHash60Sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 100 <
              |                      (CASE WHEN source = 'src0' THEN 80 WHEN source = 'src1' THEN 40 ELSE 10 END)
              |                 THEN 1 ELSE 0 END) AS BIGINT) * 10000) // count(*) AS admit_bp
              |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),

    // E3aj temperature-scaled source sampling (α = 0.5) — the classic
    // multilingual mixing rule (mBERT/XLM exponential smoothing, the
    // pre-UniMax standard): sampling shares ∝ tokens^α flatten the source
    // distribution, boosting low-resource sources without drowning
    // high-resource ones. E3l applies FIXED per-source rates and E3ac caps
    // epochs; this computes the rates themselves from the corpus — the
    // report a data-mix owner reads before setting either. Output per
    // source: token count, proportional share, α=0.5 share, and the boost
    // ratio the temperature applies (milli — >1000 means up-sampled).
    //
    // Exactness: w = floor(sqrt(tokens)) — IEEE sqrt is correctly rounded
    // in both engines over same BIGINT→DOUBLE operands, floor has no
    // half-way ties (the E2a sqrt precedent, here on the output path like
    // q_cosine_topk's cos_r); shares are integer basis points off 1-row
    // broadcast totals. Scale shape: one per-source partial-aggregated
    // groupBy over the scan, a broadcast of the 1-row totals, row-local
    // arithmetic — no window, no pairwise anything.
    GraftQuery(
      "q_temperature_mix",
      "alpha=0.5 temperature sampling shares per source: tokens, prop vs sqrt share, boost",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .withColumn("t", expr(s"cast(size($wordsSql) as bigint)"))
          .groupBy("source").agg(sum(col("t")).as("tokens"))
          .withColumn("w", expr("cast(floor(sqrt(cast(tokens as double))) as bigint)"))
        val tot = toks.agg(sum(col("tokens")).as("tt"), sum(col("w")).as("tw"))
        toks.crossJoin(broadcast(tot))
          .withColumn("prop_bp", expr("(tokens * 10000) div tt"))
          .withColumn("samp_bp", expr("(w * 10000) div tw"))
          .withColumn("boost_milli", expr("(samp_bp * 1000) div greatest(1L, prop_bp)"))
          .select("source", "tokens", "prop_bp", "samp_bp", "boost_milli")
          .orderBy("source")
      },
      Some(s"""WITH toks AS (
              |  SELECT source, CAST(sum(len($duckWordsSql)) AS BIGINT) AS tokens
              |  FROM documents GROUP BY source),
              |w AS (SELECT source, tokens,
              |             CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS w
              |      FROM toks),
              |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS tt,
              |               CAST(sum(w) AS BIGINT) AS tw FROM w)
              |SELECT source, tokens,
              |       (tokens * 10000) // tt AS prop_bp,
              |       (w * 10000) // tw AS samp_bp,
              |       (((w * 10000) // tw) * 1000) // greatest(1, (tokens * 10000) // tt) AS boost_milli
              |FROM w, tot ORDER BY source""".stripMargin)
    ),

    // E3h heavy hitters: top-5 most frequent words per source — the
    // vocabulary / boilerplate-detection scan (a source whose top terms are
    // navigation chrome is a scraping artifact). One partial-aggregated
    // shuffle on (source, word), then a top-k window partitioned by source;
    // deterministic tie-break on the word itself.
    GraftQuery(
      "q_top_terms",
      "top-5 most frequent words per source",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("n").desc, col("w").asc)
        Tables.documents(s, dir)
          .select(col("source"), explode(expr(wordsSql)).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w").agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("source"), col("rk").cast("long").as("rk"), col("w"), col("n"))
          .orderBy("source", "rk")
      },
      Some(s"""WITH c AS (
              |  SELECT source, w, count(*) AS n
              |  FROM (SELECT source, unnest($duckWordsSql) AS w FROM documents) t
              |  WHERE w <> '' GROUP BY source, w)
              |SELECT source, rk, w, n FROM (
              |  SELECT source, w, n,
              |         row_number() OVER (PARTITION BY source ORDER BY n DESC, w) AS rk
              |  FROM c) r
              |WHERE rk <= 5 ORDER BY source, rk""".stripMargin)
    ),

    // E3i intra-document repetition: repeated-2-gram fraction per doc — the
    // C4/Gopher-style boilerplate signal (a doc whose grams are mostly
    // duplicates is template chrome, not prose), distinct from the
    // cross-doc dedup family. One exploded gram stream → one per-doc
    // aggregate; repetition emitted as integer basis points (floor
    // division — no float ties). Docs with fewer than two words have no
    // grams and are excluded in both engines.
    GraftQuery(
      "q_repetition",
      "repeated-2-gram fraction per document, in basis points",
      // row-local like its own oracle twin: the measure is PER-DOC, so
      // total = size(grams) and n_distinct = size(array_distinct(grams))
      // need no explode and no (doc_id, gram) exchange at all — the
      // exploded groupBy + countDistinct form this replaced shuffled the
      // corpus's gram strings to recount what each row already knows
      (s, dir) =>
        Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"), expr(wordsSql).as("words"))
          .filter(expr("size(words) >= 2"))
          .select(col("doc_id"), expr(
            "transform(sequence(1, size(words) - 1), " +
              "i -> concat_ws(' ', words[i - 1], words[i]))").as("grams"))
          .select(col("doc_id"),
            expr("cast(size(grams) as bigint)").as("total"),
            expr("cast(size(array_distinct(grams)) as bigint)").as("n_distinct"))
          .withColumn("rep_bp", expr("((total - n_distinct) * 10000) div total"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, total, n_distinct,
              |       ((total - n_distinct) * 10000) // total AS rep_bp
              |FROM (
              |  SELECT doc_id, len(grams) AS total,
              |         len(list_distinct(grams)) AS n_distinct
              |  FROM (SELECT doc_id,
              |               $duckGramsSql AS grams
              |        FROM (SELECT doc_id, $duckWordsSql AS words FROM documents) w
              |        WHERE len(words) >= 2) g) r
              |ORDER BY doc_id""".stripMargin)
    ),

    // E3j length-distribution profile: exact per-source quantiles of the
    // whitespace token count — the corpus-shape report (p25/p50/p75/p90)
    // every data-mix dashboard tracks. Computed the distributed way: a
    // (source, tok) HISTOGRAM first (vocabulary-of-lengths cardinality, not
    // corpus cardinality), then a cumulative window over the histogram rows
    // and rank-selection at ceil(p·n/100). A row-level window (sort every
    // document per source) would put the whole corpus through per-source
    // sorts; the histogram form shrinks the windowed data by the per-source
    // doc/length-value ratio. Thresholds are pure integer math
    // ((p·n + 99) div 100) — float p·n has representation-dependent ceils.
    GraftQuery(
      "q_token_quantiles",
      "per-source exact token-count quantiles via histogram cumsum",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
        val hist = Tables.documents(s, dir)
          .withColumn("tok", expr(s"cast(size($wordsSql) as bigint)"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        def pick(p: Int) =
          min(when(expr(s"cum >= ($p * n + 99) div 100"), col("tok"))).as(s"p$p")
        hist
          .withColumn("cum", sum("c").over(
            w.partitionBy("source").orderBy("tok")
              .rowsBetween(w.unboundedPreceding, w.currentRow)))
          .withColumn("n", sum("c").over(w.partitionBy("source")))
          .groupBy("source")
          .agg(max("n").as("n_docs"),
            min("tok").as("min_tok"), max("tok").as("max_tok"),
            pick(25), pick(50), pick(75), pick(90))
          .orderBy("source")
      },
      Some(s"""WITH h AS (
              |  SELECT source, len($duckWordsSql) AS tok, count(*) AS c
              |  FROM documents GROUP BY 1, 2),
              |cw AS (
              |  SELECT source, tok, c,
              |         sum(c) OVER (PARTITION BY source ORDER BY tok
              |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
              |         sum(c) OVER (PARTITION BY source) AS n
              |  FROM h)
              |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
              |       min(tok) AS min_tok, max(tok) AS max_tok,
              |       min(CASE WHEN cum >= (25 * n + 99) // 100 THEN tok END) AS p25,
              |       min(CASE WHEN cum >= (50 * n + 99) // 100 THEN tok END) AS p50,
              |       min(CASE WHEN cum >= (75 * n + 99) // 100 THEN tok END) AS p75,
              |       min(CASE WHEN cum >= (90 * n + 99) // 100 THEN tok END) AS p90
              |FROM cw GROUP BY source ORDER BY source""".stripMargin)
    ),

    // E3n sequence packing: assign each document its position in a fixed
    // token-budget context-window stream — the LLM batch-prep stage that
    // turns a curated corpus into training sequences (concatenate per
    // source in doc_id order, split every PackBudget tokens; a document's
    // pack is where its first token lands). Exclusive cumulative token sum
    // per source → pack_id = off div budget, pack_off = off mod budget —
    // integer-only, so both engines agree exactly.
    //
    // Scale shape: ONE keyed window per source (packing is inherently a
    // per-source sequential semantics — the order of documents IS the
    // output). At 100 TB the same plan holds because each source's docs
    // sort within their partition group; a corpus whose single source
    // outgrows an executor moves to the hierarchical prefix-sum form
    // (per-partition token subtotals collected once, broadcast back as
    // starting offsets — the zipWithIndex shape), which preserves these
    // exact outputs.
    GraftQuery(
      "q_pack_sequences",
      s"greedy context-window packing: per-source token cumsum div $PackBudget",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        Tables.documents(s, dir)
          .withColumn("tok", expr(s"cast(size($wordsSql) as bigint)"))
          .withColumn("off", coalesce(sum("tok").over(w), lit(0L)))
          .select(col("source"), col("doc_id"), col("tok"),
            expr(s"off div $PackBudget").as("pack_id"),
            expr(s"off % $PackBudget").as("pack_off"))
          .orderBy("source", "doc_id")
      },
      Some(s"""SELECT source, doc_id, tok,
              |       off // $PackBudget AS pack_id, off % $PackBudget AS pack_off
              |FROM (
              |  SELECT source, doc_id, tok,
              |         CAST(coalesce(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
              |  FROM (SELECT source, doc_id, len($duckWordsSql) AS tok FROM documents) t) p
              |ORDER BY source, doc_id""".stripMargin)
    ),

    // E3o one BPE training step: the adjacent-character-pair frequencies a
    // byte-pair-encoding tokenizer merges on, counted the way every real
    // BPE trainer does it — over the WORD HISTOGRAM, not the corpus. The
    // corpus pays exactly one shuffle (word → count, vocabulary
    // cardinality); the char-pair explode then runs on vocab-sized data
    // (each distinct word once, weighted by its count), so the expensive
    // stage is O(vocab · word length) no matter how many times a word
    // repeats in 100 TB. Top-50 by weighted frequency via global sort +
    // LIMIT (TakeOrderedAndProject — no partition-less window), pair string
    // as the deterministic tie-break.
    GraftQuery(
      "q_bpe_pair_counts",
      "BPE step-1 pair frequencies: weighted adjacent char pairs over the word histogram, top 50",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(explode(expr(wordsSql)).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("wc"))
          .filter(length(col("w")) >= 2)
          .select(col("wc"), explode(expr(
            "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
          .groupBy("pair").agg(sum("wc").as("freq"))
          .orderBy(col("freq").desc, col("pair"))
          .limit(50),
      Some(s"""WITH wx AS (SELECT unnest($duckWordsSql) AS w FROM documents),
              |wf AS (SELECT w, count(*) AS wc FROM wx WHERE w <> '' GROUP BY w),
              |p AS (SELECT wc, unnest([w[i:i+1] for i in range(1, len(w))]) AS pair
              |      FROM wf WHERE len(w) >= 2)
              |SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
              |FROM p GROUP BY pair ORDER BY freq DESC, pair LIMIT 50""".stripMargin)
    ),

    // E3p deterministic training-order shuffle: the global random order a
    // training run reads the corpus in, made reproducible and DISTRIBUTED —
    // shard = seeded hash mod NShards (the parallel unit), position = rank
    // of (hash, doc_id) within the shard. This is the two-level shape every
    // large-scale shuffle uses (a single global row_number would be a
    // partition-less window — the one plan shape this engine bans): shards
    // are independent, each sorts only its own slice, and changing the seed
    // string re-deals the whole corpus. (hash, doc_id) ordering keeps the
    // rank deterministic even on 60-bit hash collisions.
    GraftQuery(
      "q_shuffle_order",
      "seeded deterministic corpus shuffle: hash shard + in-shard rank",
      (s, dir) => {
        val h = expr(hash60Sql("concat('shuffle0:', cast(doc_id as string))"))
        Tables.documents(s, dir)
          .select(col("doc_id"), h.as("h"))
          .withColumn("shard", col("h") % NShards)
          .withColumn("pos", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("shard").orderBy("h", "doc_id")).cast("bigint"))
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos")
      },
      Some(s"""WITH h AS (
              |  SELECT doc_id, ${duckHash60Sql("'shuffle0:' || doc_id::VARCHAR")} AS h
              |  FROM documents)
              |SELECT doc_id, CAST(h % $NShards AS BIGINT) AS shard,
              |       CAST(row_number() OVER (PARTITION BY h % $NShards ORDER BY h, doc_id) AS BIGINT) AS pos
              |FROM h ORDER BY shard, pos""".stripMargin)
    ),

    // E3q Count-Min Sketch frequency estimates (Cormode & Muthukrishnan
    // 2005): CmsDepth salted hash rows × CmsWidth counters; an item's
    // estimate is the MIN of its counters — always >= the true count. THE
    // mergeable frequency sketch for 100 TB scans: the sketch is a D×W
    // grid of addable counters, so partial aggregation combines map-side
    // and sketches of shards merge by addition. Built over the word
    // HISTOGRAM (one vocab-cardinality shuffle — same move as the BPE
    // step), graded against the exact counts of the top-20 terms so the
    // collision error is visible in the output. Width 64 is sized so the
    // error branch actually fires on the test corpus (the KMV K=16
    // rationale); production sets W = ceil(e/eps) — sketch size stays
    // O(D·W), independent of the corpus.
    GraftQuery(
      "q_cms_counts",
      "count-min sketch (4x64, shared hash60 salts) vs exact counts of top-20 terms",
      (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(expr(wordsSql)).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("wc"))
          .persist()
        val bucketExprs = cmsBucketExprs
        val sketch = vocab
          .select(col("wc"), posexplode(array(bucketExprs: _*)).as(Seq("r", "bucket")))
          .groupBy("r", "bucket").agg(sum("wc").as("cnt"))
        val probes = vocab.orderBy(col("wc").desc, col("w")).limit(20)
        probes
          .select(col("w"), col("wc"), posexplode(array(bucketExprs: _*)).as(Seq("r", "bucket")))
          .join(sketch, Seq("r", "bucket"))
          .groupBy("w").agg(max("wc").as("exact"), min("cnt").as("cms_est"))
          .orderBy("w")
      },
      Some(s"""WITH wx AS (SELECT unnest($duckWordsSql) AS w FROM documents),
              |vocab AS (SELECT w, count(*) AS wc FROM wx WHERE w <> '' GROUP BY w),
              |rs AS (SELECT unnest(range(0, $CmsDepth)) AS r),
              |sk AS (
              |  SELECT r, ${duckHash60Sql("'cms' || r::VARCHAR || ':' || w")} % $CmsWidth AS bucket,
              |         CAST(sum(wc) AS BIGINT) AS cnt
              |  FROM vocab, rs GROUP BY 1, 2),
              |probes AS (SELECT w, wc FROM vocab ORDER BY wc DESC, w LIMIT 20),
              |pb AS (
              |  SELECT p.w, p.wc, rs.r,
              |         ${duckHash60Sql("'cms' || rs.r::VARCHAR || ':' || p.w")} % $CmsWidth AS bucket
              |  FROM probes p, rs)
              |SELECT pb.w, CAST(max(pb.wc) AS BIGINT) AS exact, min(s.cnt) AS cms_est
              |FROM pb JOIN sk s ON s.r = pb.r AND s.bucket = pb.bucket
              |GROUP BY pb.w ORDER BY pb.w""".stripMargin)
    ),

    // E3ak unigram-distribution KL divergence per source vs the corpus —
    // the TOKEN-distribution drift monitor beside E3r's numeric KS: a
    // source whose word distribution diverges from the corpus mixture is
    // the one injecting new boilerplate or a new language, and KL(P_s ||
    // P_corpus) is the standard magnitude for that shift. Computed on the
    // E3aa/DSIR integer log2-floor skeleton: per word, lam = floor-log2
    // (c_sw·t) − floor-log2(t_s·c_w) (the bin-length trick — the exact
    // log2 of the probability ratio would be engine-divergent floats), and
    // the expectation Σ (c_sw/t_s)·lam is taken through the +64 offset so
    // the dividend stays nonnegative — Spark's `div` truncates while
    // DuckDB's `//` floors, and they only agree on nonnegative operands
    // (the q_dsir_select div-vs-floor rule); the offset divides out
    // exactly (64000·t_s div t_s = 64000) and is subtracted back after.
    // Scale shape: two partial-aggregated groupBys over one exploded scan
    // (per-(source, word) and per-word corpus counts — both vocab-bound,
    // never corpus-bound), the corpus side broadcast back, row-local
    // arithmetic, one #sources-row output. No window, no pairs.
    GraftQuery(
      "q_unigram_kl",
      "per-source unigram KL vs the corpus mixture (integer log2-floor skeleton, milli)",
      (s, dir) => {
        val wc = Tables.documents(s, dir)
          .select(col("source"), explode(expr(wordsSql)).as("w"))
          .filter(col("w") =!= "")
          .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
          .persist()
        val stot = wc.groupBy("source").agg(sum(col("c_sw")).as("t_s"))
        val ctot = wc.groupBy("w").agg(sum(col("c_sw")).as("c_w"))
        val tot  = wc.agg(sum(col("c_sw")).as("t"))
        wc.join(stot, "source")
          .join(broadcast(ctot), "w")
          .crossJoin(broadcast(tot))
          .withColumn("lam_off",
            expr("64L + (length(bin(c_sw * t)) - 1) - (length(bin(t_s * c_w)) - 1)"))
          .groupBy("source")
          .agg(max(col("t_s")).as("n_tokens"),
            sum(expr("c_sw * lam_off * 1000L")).as("num"))
          .withColumn("kl_milli", expr("num div n_tokens - 64000L"))
          .select("source", "n_tokens", "kl_milli")
          .orderBy("source")
      },
      Some(s"""WITH wx AS (
              |  SELECT source, unnest($duckWordsSql) AS w FROM documents),
              |wc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c_sw
              |       FROM wx WHERE w <> '' GROUP BY source, w),
              |st AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS t_s FROM wc GROUP BY source),
              |ct AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w FROM wc GROUP BY w),
              |tt AS (SELECT CAST(sum(c_sw) AS BIGINT) AS t FROM wc),
              |lam AS (
              |  SELECT wc.source, wc.c_sw, st.t_s,
              |         64 + (length(bin(wc.c_sw * tt.t)) - 1)
              |            - (length(bin(st.t_s * ct.c_w)) - 1) AS lam_off
              |  FROM wc JOIN st USING (source) JOIN ct USING (w), tt)
              |SELECT source, CAST(max(t_s) AS BIGINT) AS n_tokens,
              |       CAST(sum(c_sw * lam_off * 1000) AS BIGINT) // max(t_s) - 64000 AS kl_milli
              |FROM lam GROUP BY source ORDER BY source""".stripMargin)
    ),

    // E3r distribution-drift detection: the two-sample Kolmogorov–Smirnov
    // statistic between each source's token-length distribution and the
    // src0 reference — the data-quality monitor that catches a source
    // silently changing shape (truncation bugs, new boilerplate, crawler
    // drift) before it skews training. Computed EXACTLY in integers: the
    // CDFs are compared by cross-multiplication (|f·n0 − f0·n| avoids
    // fractions entirely), and the statistic is reported in basis points
    // via floor division. Exact while n·n0·10^4 < 2^63 — ~3·10^7 docs per
    // source at bp precision; beyond that the final scaling moves to
    // decimal(38,0), same plan.
    //
    // Scale shape: the corpus pays ONE (source, tok) histogram aggregate;
    // everything after runs on the histogram grid (sources × distinct
    // lengths — vocabulary-of-lengths cardinality, independent of corpus
    // rows). The grid cross join is two tiny derived frames; CDFs are
    // source-keyed cumulative windows over grid rows (the q_token_quantiles
    // move), never per-document sorts.
    GraftQuery(
      "q_ks_drift",
      "two-sample KS statistic (bp) of token-length distributions vs src0, per source",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
        val hist = Tables.documents(s, dir)
          .withColumn("tok", expr(s"cast(size($wordsSql) as bigint)"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val spine = hist.select("tok").distinct()
        val srcs  = hist.select("source").distinct()
        val cum = srcs.crossJoin(spine)
          .join(hist, Seq("source", "tok"), "left")
          .withColumn("cc", coalesce(col("c"), lit(0L)))
          .withColumn("f", sum("cc").over(
            w.partitionBy("source").orderBy("tok")
              .rowsBetween(w.unboundedPreceding, w.currentRow)))
          .withColumn("n", sum("cc").over(w.partitionBy("source")))
          .select("source", "tok", "f", "n")
        val ref = cum.filter(col("source") === "src0")
          .select(col("tok"), col("f").as("f0"), col("n").as("n0"))
        cum.filter(col("source") =!= "src0")
          .join(ref, "tok")
          .groupBy("source")
          .agg(max(abs(col("f") * col("n0") - col("f0") * col("n"))).as("d"),
            max(col("n")).as("n"), max(col("n0")).as("n0"))
          .select(col("source"),
            expr("(d * 10000) div (n * n0)").as("ks_bp"),
            col("n").as("n_docs"))
          .orderBy("source")
      },
      Some(s"""WITH h AS (
              |  SELECT source, CAST(len($duckWordsSql) AS BIGINT) AS tok, count(*) AS c
              |  FROM documents GROUP BY 1, 2),
              |spine AS (SELECT DISTINCT tok FROM h),
              |srcs AS (SELECT DISTINCT source FROM h),
              |cum AS (
              |  SELECT g.source, g.tok,
              |         CAST(sum(coalesce(h.c, 0)) OVER (PARTITION BY g.source ORDER BY g.tok
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f,
              |         CAST(sum(coalesce(h.c, 0)) OVER (PARTITION BY g.source) AS BIGINT) AS n
              |  FROM (SELECT s.source, p.tok FROM srcs s, spine p) g
              |  LEFT JOIN h ON h.source = g.source AND h.tok = g.tok),
              |ref AS (SELECT tok, f AS f0, n AS n0 FROM cum WHERE source = 'src0')
              |SELECT c.source,
              |       CAST(max(abs(c.f * r.n0 - r.f0 * c.n)) * 10000 // (max(c.n) * max(r.n0)) AS BIGINT) AS ks_bp,
              |       max(c.n) AS n_docs
              |FROM cum c JOIN ref r USING (tok)
              |WHERE c.source <> 'src0'
              |GROUP BY c.source ORDER BY c.source""".stripMargin)
    ),

    // E3s collocation mining: top bigrams by a pointwise-mutual-information
    // proxy — PMI ranks pairs by p(ab)/(p(a)p(b)), and the MONOTONE integer
    // form bc·N·100 div (c1·c2) ranks identically to the log without ever
    // computing one (log is not correctly-rounded cross-engine; integer
    // div is exact — the BM25 rational-idf move). The bc >= 5 support floor
    // is the standard collocation guard against one-off pairs dominating.
    // Exact while bc·N·100 < 2^63; beyond ~10^9 total tokens the scale
    // factor moves to decimal(38,0), same plan.
    //
    // Scale shape: one (w1, w2) bigram histogram + one word histogram
    // (corpus-cardinality aggregates with map-side partials), then
    // vocab-sized joins and a TakeOrderedAndProject top-50 — the expensive
    // work never exceeds histogram cardinality.
    GraftQuery(
      "q_collocations",
      "top-50 bigram collocations by integer PMI proxy (support >= 5)",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val wf = docs.select(explode(expr(wordsSql)).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("wc"))
          .persist()
        val nw = wf.agg(sum("wc").as("nw"))
        // bigrams built ROW-LOCALLY by zipping the words array against its
        // own 1-shifted slice — a pure histogram needs no doc-keyed window
        // (the exploded lead construction elsewhere exists for pipelines
        // that also need positions/carry columns; here it would exchange
        // and sort every token row of the corpus for nothing). Two slice
        // references evaluate the split twice per ROW — constant — unlike
        // a per-element element_at lambda, which Catalyst would inline to
        // one split evaluation per bigram.
        val bg = docs
          .withColumn("ws", expr(wordsSql))
          .filter(size(col("ws")) >= 2)
          .withColumn("a1", slice(col("ws"), lit(1), size(col("ws")) - 1))
          .withColumn("a2", slice(col("ws"), lit(2), size(col("ws")) - 1))
          .select(explode(arrays_zip(col("a1"), col("a2"))).as("p"))
          .select(col("p.a1").as("w1"), col("p.a2").as("w2"))
          .filter(col("w1") =!= "" && col("w2") =!= "")
          .groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
          .filter(col("bc") >= 5)
        bg.join(wf.select(col("w").as("w1"), col("wc").as("c1")), "w1")
          .join(wf.select(col("w").as("w2"), col("wc").as("c2")), "w2")
          .crossJoin(broadcast(nw))
          .select(col("w1"), col("w2"), col("bc"),
            expr("(bc * nw * 100) div (c1 * c2)").as("pmi_c"))
          .orderBy(col("pmi_c").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some(s"""WITH docs AS (SELECT doc_id, $duckWordsSql AS words FROM documents),
              |wx AS (SELECT unnest(words) AS w FROM docs),
              |wf AS (SELECT w, count(*) AS wc FROM wx WHERE w <> '' GROUP BY w),
              |n AS (SELECT CAST(sum(wc) AS BIGINT) AS nw FROM wf),
              |bg AS (
              |  SELECT words[i] AS w1, words[i+1] AS w2, count(*) AS bc
              |  FROM (SELECT words, unnest(range(1, len(words))) AS i
              |        FROM docs WHERE len(words) >= 2) t
              |  WHERE words[i] <> '' AND words[i+1] <> ''
              |  GROUP BY 1, 2)
              |SELECT b.w1, b.w2, b.bc,
              |       (b.bc * n.nw * 100) // (a.wc * c.wc) AS pmi_c
              |FROM bg b JOIN wf a ON a.w = b.w1 JOIN wf c ON c.w = b.w2, n
              |WHERE b.bc >= 5
              |ORDER BY pmi_c DESC, w1, w2 LIMIT 50""".stripMargin)
    ),

    // E3t PII redaction: regex-scrub emails and phone numbers before a
    // corpus ships to training — the scrubbing pass every LLM data pipeline
    // runs (and the privacy twin of the reference's field-sanitization gates,
    // pet_scraper.py:364-407). The synthetic corpus contains no PII, so the
    // harness plants it deterministically from doc_id (identical string
    // construction in both engines) and the graded operator is the
    // redaction itself: replace-all plus per-doc match counts.
    //
    // Scale shape: a pure per-row codegen'd expression pipeline — no
    // shuffle, no join, no window; the 100 TB cost is exactly one scan.
    // Regexes stay in the Java∩RE2 common subset (character classes,
    // bounded repeats — no lookarounds) so both engines see the same
    // matches.
    GraftQuery(
      "q_pii_redact",
      "regex email/phone scrub with per-doc redaction counts",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("aug", expr(
            s"""concat(coalesce(text, ''),
               |  ' contact u', doc_id, '@mail', doc_id % 10, '.com',
               |  CASE WHEN doc_id % 3 = 0
               |       THEN concat(' cc admin', doc_id % 7, '@site.org') ELSE '' END,
               |  CASE WHEN doc_id % 2 = 0
               |       THEN concat(' call 555-', lpad(cast(doc_id % 10000 as string), 4, '0'))
               |       ELSE '' END)""".stripMargin))
          .withColumn("n_emails", expr(
            s"cast(size(regexp_extract_all(aug, '$EmailRe', 0)) as bigint)"))
          .withColumn("n_phones", expr(
            s"cast(size(regexp_extract_all(aug, '$PhoneRe', 0)) as bigint)"))
          .withColumn("redacted", expr(
            s"regexp_replace(regexp_replace(aug, '$EmailRe', '<EMAIL>'), '$PhoneRe', '<PHONE>')"))
          .select("doc_id", "n_emails", "n_phones", "redacted")
          .orderBy("doc_id"),
      Some(s"""WITH aug AS (
              |  SELECT doc_id,
              |         coalesce(text, '')
              |           || ' contact u' || CAST(doc_id AS VARCHAR)
              |           || '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.com'
              |           || CASE WHEN doc_id % 3 = 0
              |                THEN ' cc admin' || CAST(doc_id % 7 AS VARCHAR) || '@site.org'
              |                ELSE '' END
              |           || CASE WHEN doc_id % 2 = 0
              |                THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              |                ELSE '' END AS aug
              |  FROM documents)
              |SELECT doc_id,
              |       CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
              |       CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
              |       regexp_replace(regexp_replace(aug, '$EmailRe', '<EMAIL>', 'g'),
              |                      '$PhoneRe', '<PHONE>', 'g') AS redacted
              |FROM aug ORDER BY doc_id""".stripMargin)
    ),

    // E3u tokenizer vocabulary coverage: per-source out-of-vocabulary rate
    // against the top-K corpus tokens — the audit that tells a pipeline
    // whether a tokenizer's vocab (here the frequency-built stand-in for a
    // trained BPE vocab, sharing q_bpe_pair_counts' pre-tokenization) fits
    // a new data source before training on it.
    //
    // Scale shape: the corpus collapses to a (source, token) histogram
    // FIRST (map-side partial agg), so the vocab ranking and the OOV join
    // both run at vocabulary cardinality, never corpus cardinality; the
    // top-K is a TakeOrderedAndProject and the K-row vocab is broadcast.
    // Deterministic tie-break (count desc, token asc) in both engines.
    GraftQuery(
      "q_vocab_oov",
      s"per-source OOV rate (basis points) against the top-$VocabK token vocab",
      (s, dir) => {
        val hist = Tables.documents(s, dir)
          .select(col("source"), explode(
            expr(s"regexp_extract_all(coalesce(text, ''), '$TokenRe', 0)")).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("n"))
          .persist()
        val vocab = hist.groupBy("tok").agg(sum("n").as("gn"))
          .orderBy(col("gn").desc, col("tok").asc)
          .limit(VocabK)
          .select("tok")
        hist
          .join(broadcast(vocab.withColumn("in_v", lit(1L))), Seq("tok"), "left")
          .groupBy("source")
          .agg(sum(col("n")).as("total_tokens"),
            sum(when(col("in_v").isNull, col("n")).otherwise(0L)).as("oov_tokens"))
          .withColumn("oov_bp", expr("(oov_tokens * 10000) div total_tokens"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (
              |  SELECT source, unnest(regexp_extract_all(coalesce(text, ''), '$TokenRe')) AS tok
              |  FROM documents),
              |h AS (SELECT source, tok, count(*) AS n FROM t GROUP BY source, tok),
              |v AS (SELECT tok FROM (
              |        SELECT tok, CAST(sum(n) AS BIGINT) AS gn FROM h GROUP BY tok)
              |      ORDER BY gn DESC, tok LIMIT $VocabK)
              |SELECT source,
              |       CAST(sum(n) AS BIGINT) AS total_tokens,
              |       CAST(sum(CASE WHEN v.tok IS NULL THEN n ELSE 0 END) AS BIGINT) AS oov_tokens,
              |       (CAST(sum(CASE WHEN v.tok IS NULL THEN n ELSE 0 END) AS BIGINT) * 10000)
              |         // CAST(sum(n) AS BIGINT) AS oov_bp
              |FROM h LEFT JOIN v ON h.tok = v.tok
              |GROUP BY source ORDER BY source""".stripMargin)
    ),

    // E3v document chunking: split each doc into overlapping fixed-size
    // token windows — the retrieval-embedding prep stage and the dual of
    // q_pack_sequences (packing concatenates short docs UP to a budget;
    // chunking splits long docs DOWN to one). Emitted as (chunk_id, start,
    // end) offsets; at scale the same explode carries the token slice
    // itself to the embedder.
    //
    // Scale shape: chunk starts generate ROW-LOCALLY (sequence + explode —
    // a doc knows its own chunk count from its own length); no shuffle, no
    // window, no join before the output sort. Chunk rows ≈ corpus tokens /
    // stride, linear in the input.
    GraftQuery(
      "q_chunk_windows",
      s"overlapping $ChunkW-token chunk windows (stride $ChunkS) per document",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("n", expr(s"cast(size($wordsSql) as bigint)"))
          .select(col("doc_id"), col("n"),
            explode(expr(s"sequence(0L, n - 1, $ChunkS)")).as("start"))
          .select(col("doc_id"),
            expr(s"start div $ChunkS").as("chunk_id"),
            col("start").as("chunk_start"),
            expr(s"least(start + $ChunkW, n)").as("chunk_end"),
            expr(s"least($ChunkW, n - start)").as("n_tokens"))
          .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH d AS (
              |  SELECT doc_id, CAST(len($duckWordsSql) AS BIGINT) AS n FROM documents),
              |c AS (SELECT doc_id, n, unnest(range(0, n, $ChunkS)) AS start FROM d)
              |SELECT doc_id, start // $ChunkS AS chunk_id, start AS chunk_start,
              |       least(start + $ChunkW, n) AS chunk_end,
              |       least($ChunkW, n - start) AS n_tokens
              |FROM c ORDER BY doc_id, chunk_id""".stripMargin)
    ),

    // E3w top-k vocabulary coverage curve: what share of all corpus tokens
    // the k most frequent words cover, for k = 1..CovK — the tokenizer/
    // vocab-sizing metric (diminishing-returns curve for vocab truncation).
    //
    // Scale shape: one vocab-cardinality shuffle (the word histogram), a
    // TakeOrderedAndProject top-CovK, a 1-row totals broadcast, and a
    // triangular self-join over the CovK survivors for rank + running sum —
    // the engine's standard bounded-cumsum move (same as paginate's offsets;
    // a partition-less running window is the one plan shape this engine
    // bans, even over 30 rows). Integer basis points; count ties broken by
    // word so both engines rank identically.
    GraftQuery(
      "q_vocab_coverage",
      s"cumulative token coverage (bp) of the top-$CovK vocabulary words",
      (s, dir) => {
        // the same histogram the BPE trainer folds over — one construction
        val hist = graft.operators.Bpe.wordHistogram(Tables.documents(s, dir), wordsSql)
          .withColumnRenamed("wc", "freq")
        val tot = hist.agg(sum("freq").as("total"))
        val top = hist.orderBy(col("freq").desc, col("w")).limit(CovK)
        val a = top.alias("a")
        val b = top.alias("b")
        a.join(b,
            col("b.freq") > col("a.freq") ||
              (col("b.freq") === col("a.freq") && col("b.w") < col("a.w")),
            "left")
          .groupBy(col("a.w").as("w"), col("a.freq").as("freq"))
          .agg(
            (count(col("b.w")) + 1L).as("rank"),
            coalesce(sum(col("b.freq")), lit(0L)).as("prev_sum"))
          .withColumn("cum", col("prev_sum") + col("freq"))
          .crossJoin(broadcast(tot))
          .select(col("rank"), col("w"), col("freq"),
            expr("(cum * 10000) div total").as("cum_bp"))
          .orderBy("rank")
      },
      Some(s"""WITH wx AS (SELECT unnest($duckWordsSql) AS w FROM documents),
              |wf AS (SELECT w, count(*) AS freq FROM wx WHERE w <> '' GROUP BY w),
              |t AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM wf),
              |top AS (SELECT w, freq FROM wf ORDER BY freq DESC, w LIMIT $CovK)
              |SELECT CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT) AS rank,
              |       w, CAST(freq AS BIGINT) AS freq,
              |       (CAST(sum(freq) OVER (ORDER BY freq DESC, w
              |          ROWS UNBOUNDED PRECEDING) AS BIGINT) * 10000) // total AS cum_bp
              |FROM top, t ORDER BY rank""".stripMargin)
    ),

    // E3x document-frequency histogram over 2-gram shingles: how many
    // distinct grams appear in exactly k documents (k capped at DfCap,
    // heavier grams pooled into the overflow bucket). This is the tuning
    // input for the engine's own df-thresholded stages — the stop-gram cap
    // (q_ngram_jaccard drops grams with df > 50) and IDF floors pick their
    // thresholds off exactly this curve. Grams, not words: the thresholds
    // they tune are gram-level, and gram cardinality gives the histogram a
    // real small-df shape.
    //
    // Scale shape: per-doc distinct grams build ROW-LOCALLY (transform over
    // the words array — no pre-aggregate shuffle), then one gram-cardinality
    // df count and a ≤ DfCap+1-row histogram; partial aggregation before
    // both exchanges, nothing wider than the gram vocabulary after the
    // first shuffle.
    GraftQuery(
      "q_df_histogram",
      s"document-frequency histogram of 2-grams: n_grams per df (df capped at $DfCap+overflow)",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), expr(wordsSql).as("words"))
          .filter(size(col("words")) >= 2)
          .select(col("doc_id"), explode(expr(
            "array_distinct(transform(sequence(1, size(words) - 1), " +
              "i -> concat_ws(' ', words[i-1], words[i])))")).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("df"))
          .groupBy(least(col("df"), lit(DfCap + 1L)).as("df_bucket"))
          .agg(count(lit(1)).as("n_grams"), sum("df").as("doc_hits"))
          .orderBy("df_bucket"),
      Some(s"""WITH gx AS (
              |  SELECT DISTINCT doc_id, gram FROM (
              |    SELECT doc_id, unnest(list_distinct($duckGramsSql)) AS gram
              |    FROM (SELECT doc_id, $duckWordsSql AS words FROM documents) w
              |    WHERE len(words) >= 2) g),
              |gf AS (SELECT gram, count(*) AS df FROM gx GROUP BY gram)
              |SELECT CAST(least(df, ${DfCap + 1}) AS BIGINT) AS df_bucket,
              |       count(*) AS n_grams, CAST(sum(df) AS BIGINT) AS doc_hits
              |FROM gf GROUP BY df_bucket ORDER BY df_bucket""".stripMargin)
    ),

    // E3y's APPLICATION side, graded: tokenize every document with a fixed
    // BPE merge list. The leftmost-greedy non-overlapping fuse every BPE
    // tokenizer runs is EXACTLY non-overlapping replace-all over
    // delimiter-wrapped symbols — wrap each char as ␟c␟ (chr(31), outside
    // the corpus alphabet), then each merge (l, r) is one literal
    // replace(␟l␟␟r␟ → ␟lr␟), and the token count is half the remaining
    // delimiter count. "aaaa" under (a,a) correctly yields [aa][aa], and
    // "xl r" can never false-match inside "l r" (the delimiters block
    // cross-symbol matches). Merges are FIXED literals so the oracle is
    // scale-independent; a trained list comes from Bpe.train.
    //
    // Scale shape: entirely ROW-LOCAL string expressions inside one scan —
    // no shuffle before the output sort; the tokenizer cost is O(corpus
    // chars), the same scan a real tokenization pass pays.
    GraftQuery(
      "q_bpe_tokenize",
      "apply a fixed 3-merge BPE list per document, count resulting tokens",
      (s, dir) => {
        // len(fused) = len(w) + 2·tokens (merges only ever remove delimiter
        // pairs), so ONE evaluation of the fused chain counts the tokens
        val fused = BpeApply.fusedSql(
          "regexp_replace(w, '(.)', chr(31) || '$1' || chr(31))")
        Tables.documents(s, dir)
          .select(col("doc_id"), expr(
            s"aggregate($wordsSql, cast(0 as bigint), (acc, w) -> acc + " +
              s"(char_length($fused) - char_length(w)) div 2)")
            .as("n_tokens"))
          .orderBy("doc_id")
      },
      Some {
        val fused = BpeApply.fusedSql(
          """regexp_replace(w, '(.)', chr(31) || '\1' || chr(31), 'g')""")
        s"""SELECT doc_id,
           |  CAST(coalesce(list_sum(list_transform($duckWordsSql, w ->
           |    (len($fused) - len(w)) // 2)), 0) AS BIGINT) AS n_tokens
           |FROM documents ORDER BY doc_id""".stripMargin
      }
    ),

    // E3z bigram-LM surprisal scoring: self-train a bigram LM on the corpus
    // (unigram + bigram occurrence counts, add-one smoothing), then score
    // each document by its average per-bigram surprisal in integer
    // floor-log2 bits: bits(w1 w2) = floor(log2((c1(w1) + V) div (c12 + 1)))
    // — the integer skeleton of -log2 P(w2 | w1). This is the
    // perplexity-style quality filter of CCNet/Gopher-class pipelines
    // (documents that surprise a corpus-trained LM are boilerplate, noise,
    // or wrong-language) re-expressed in exact arithmetic: floor(log2 n) is
    // length(bin(n)) - 1 in BOTH engines, so the score never touches a
    // transcendental libm call two engines could round differently.
    // c12 <= c1 (every bigram occurrence contains a w1 occurrence) and
    // V >= 1 keep the quotient >= 1, so bin never sees 0.
    //
    // Scale shape: two vocabulary-keyed count aggregates (map-side
    // combined), a 1-row V broadcast, two vocabulary-keyed equi-joins to
    // score occurrences, one doc-keyed re-aggregate. Every stage is linear
    // in the corpus; every shuffle key is vocab- or doc-cardinality. No
    // windows, no pair expansion, no driver state beyond the 1-row V.
    GraftQuery(
      "q_lm_score",
      "avg bigram-LM surprisal per document (integer milli-bits), self-trained",
      (s, dir) => {
        val d = Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"), expr(wordsSql).as("words"))
        val uni = d.select(explode(col("words")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("c1"))
        val vRow = uni.agg(count(lit(1)).as("v"))
        val g = d.filter(expr("size(words) >= 2"))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(words) - 1), " +
              "i -> concat_ws(' ', words[i - 1], words[i]))")).as("gram"))
        val bi = g.groupBy("gram").agg(count(lit(1)).as("c12"))
        // (measured and kept as-is: resolving bits per DISTINCT gram and
        // mapping back looked cheaper but regressed — bigrams are mostly
        // singletons, so the distinct table is nearly occurrence-sized and
        // the extra gram exchange outweighed the w-join shrink)
        g.join(bi, "gram")
          .withColumn("w", substring_index(col("gram"), " ", 1))
          .join(uni, "w")
          .crossJoin(broadcast(vRow))
          .withColumn("bits",
            expr("cast(length(bin((c1 + v) div (c12 + 1))) - 1 as bigint)"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("total_bits"))
          .withColumn("milli_bits", expr("(1000 * total_bits) div n_bigrams"))
          .select("doc_id", "n_bigrams", "total_bits", "milli_bits")
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, $duckWordsSql AS words FROM documents),
              |u AS (SELECT w, count(*) AS c1
              |      FROM (SELECT unnest(words) AS w FROM d) GROUP BY w),
              |v AS (SELECT count(*) AS v FROM u),
              |g AS (SELECT doc_id, unnest($duckGramsSql) AS gram
              |      FROM d WHERE len(words) >= 2),
              |b AS (SELECT gram, count(*) AS c12 FROM g GROUP BY gram),
              |s AS (SELECT g.doc_id,
              |             length(bin((u.c1 + v.v) // (b.c12 + 1))) - 1 AS bits
              |      FROM g JOIN b USING (gram) JOIN u ON u.w = split_part(g.gram, ' ', 1), v)
              |SELECT doc_id, count(*) AS n_bigrams,
              |       CAST(sum(bits) AS BIGINT) AS total_bits,
              |       (1000 * CAST(sum(bits) AS BIGINT)) // count(*) AS milli_bits
              |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // E3aa DSIR-style importance selection (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): score every document
    // by how much its hashed-bigram features look like a TARGET domain
    // (here: the lang='en' slice) relative to the raw corpus, and keep the
    // top-k. Features are bigrams hashed into 256 buckets (the paper's
    // hashed n-gram generative model); the per-bucket importance weight is
    // the integer floor-log2 skeleton of log(p_target/p_raw):
    //   lam_b = 64 + floor(log2(t_b + 1)) - floor(log2(r_b + 1))
    // (+64 keeps every per-gram weight >= 1 so the per-gram milli-average
    // never divides a negative — Spark `div` truncates while DuckDB `//`
    // floors, and they disagree exactly on negatives; a constant per-gram
    // offset shifts every average by the same 64000 and preserves the
    // ranking). floor(log2 n) = length(bin(n)) - 1 in both engines, so no
    // transcendental ever runs.
    //
    // Scale shape: one explode pass feeds BOTH the 256-row bucket histogram
    // (map-side combined — the importance model is CONSTANT-size no matter
    // the corpus) and the scoring join, which broadcasts those 256 weights
    // back onto the gram stream; one doc-keyed re-aggregate; global top-25
    // via TakeOrderedAndProject (no partition-less window). Every shuffle
    // is bucket- or doc-keyed; nothing pairwise.
    GraftQuery(
      "q_dsir_select",
      "DSIR importance selection: top-25 docs by hashed-bigram target/raw log-ratio",
      (s, dir) => {
        val g = dsirGrams(Tables.spread(Tables.documents(s, dir)))
        dsirScore(g, dsirModel(g), 25)
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, lang, $duckWordsSql AS words FROM documents),
              |g AS (
              |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
              |         ${duckHash60Sql("gram")} % 256 AS bucket
              |  FROM (SELECT doc_id, lang, unnest($duckGramsSql) AS gram
              |        FROM d WHERE len(words) >= 2)),
              |lam AS (
              |  SELECT bucket,
              |         64 + (length(bin(CAST(sum(is_t) AS BIGINT) + 1)) - 1)
              |            - (length(bin(count(*) + 1)) - 1) AS lam
              |  FROM g GROUP BY bucket),
              |s AS (
              |  SELECT doc_id, count(*) AS n_grams, CAST(sum(lam) AS BIGINT) AS score
              |  FROM g JOIN lam USING (bucket) GROUP BY doc_id)
              |SELECT doc_id, n_grams, score, (1000 * score) // n_grams AS avg_milli
              |FROM s ORDER BY avg_milli DESC, doc_id LIMIT 25""".stripMargin)
    ),

    // E3ah tokenizer fertility audit: the per-language efficiency report
    // every multilingual-tokenizer evaluation runs — fertility (tokens
    // emitted per whitespace word) and compression (bytes per token) for
    // BOTH the BPE-ish pre-tokenizer regex and the graded 3-merge BPE
    // tokenizer (the E3y/q_bpe_tokenize fuse, so this audits the SAME
    // tokenizer the engine grades). High fertility on a language = the
    // vocab under-serves it (the GPT-2-on-non-English effect); the report
    // is the steering input for vocab rebalancing. All ratios in exact
    // integer milli-units (operands nonnegative, so Spark `div` and DuckDB
    // `//` agree).
    //
    // Scale shape: every signal is a row-local string expression inside the
    // one documents scan; ONE #langs-row partial-aggregated groupBy. No
    // joins, no windows, no second pass.
    GraftQuery(
      "q_tokenizer_fertility",
      "per-language fertility (tokens per word) + bytes-per-token for regex and BPE tokenizers",
      (s, dir) => {
        val fused = BpeApply.fusedSql(
          "regexp_replace(w, '(.)', chr(31) || '$1' || chr(31))")
        Tables.documents(s, dir)
          .withColumn("ws", expr(s"cast(size($wordsSql) as bigint)"))
          .withColumn("re", expr(s"cast(size(regexp_extract_all(coalesce(text, ''), '$TokenRe', 0)) as bigint)"))
          .withColumn("bpe", expr(
            s"aggregate($wordsSql, cast(0 as bigint), (acc, w) -> acc + " +
              s"(char_length($fused) - char_length(w)) div 2)"))
          .withColumn("bytes", expr("cast(octet_length(coalesce(text, '')) as bigint)"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("ws").as("ws_tokens"),
            sum("re").as("re_tokens"), sum("bpe").as("bpe_tokens"),
            sum("bytes").as("bytes"))
          .withColumn("fert_re_milli", expr("(1000 * re_tokens) div ws_tokens"))
          .withColumn("fert_bpe_milli", expr("(1000 * bpe_tokens) div ws_tokens"))
          .withColumn("bytes_per_bpe_milli",
            expr("(1000 * bytes) div greatest(bpe_tokens, cast(1 as bigint))"))
          .select("lang", "n_docs", "ws_tokens", "re_tokens", "bpe_tokens",
            "bytes", "fert_re_milli", "fert_bpe_milli", "bytes_per_bpe_milli")
          .orderBy("lang")
      },
      Some {
        val fused = BpeApply.fusedSql(
          """regexp_replace(w, '(.)', chr(31) || '\1' || chr(31), 'g')""")
        s"""WITH p AS (
           |  SELECT lang, len($duckWordsSql) AS ws,
           |         len(regexp_extract_all(coalesce(text, ''), '$TokenRe')) AS re,
           |         coalesce(list_sum(list_transform($duckWordsSql, w ->
           |           (len($fused) - len(w)) // 2)), 0) AS bpe,
           |         strlen(coalesce(text, '')) AS bytes
           |  FROM documents)
           |SELECT lang, count(*) AS n_docs,
           |       CAST(sum(ws) AS BIGINT) AS ws_tokens,
           |       CAST(sum(re) AS BIGINT) AS re_tokens,
           |       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
           |       CAST(sum(bytes) AS BIGINT) AS bytes,
           |       (1000 * CAST(sum(re) AS BIGINT)) // CAST(sum(ws) AS BIGINT) AS fert_re_milli,
           |       (1000 * CAST(sum(bpe) AS BIGINT)) // CAST(sum(ws) AS BIGINT) AS fert_bpe_milli,
           |       (1000 * CAST(sum(bytes) AS BIGINT))
           |         // greatest(CAST(sum(bpe) AS BIGINT), 1) AS bytes_per_bpe_milli
           |FROM p GROUP BY lang ORDER BY lang""".stripMargin
      }
    ),

    // E3ac UniMax budget allocation (Chung et al. 2023): distribute a total
    // token budget across mixture units ((lang, source) corpora here) with
    // a per-unit epoch cap — the sampling-mixture computation every
    // multilingual/multi-source pretraining run does. Each unit may
    // contribute at most epochs·tokens; the remaining budget waterfills
    // uniformly over the uncapped units at level θ.
    //
    // The waterfilling threshold in ONE pass over the unit table, no loop:
    // sort units by cap ascending — the capped set is then a PREFIX (unit i
    // is capped iff cap_i·R_i ≤ B−S_i with R_i units remaining and S_i the
    // cap-sum of earlier units; equal caps get identical conditions, so
    // ties can't split) — count it, and θ = (B − Σ capped caps) div
    // (#uncapped). Integer floor keeps θ ≥ the largest capped cap, and
    // Σ alloc ≤ B with slack < #uncapped (reported as a per-row invariant
    // via eff_epochs_bp = 10000·alloc div tokens ≤ 10000·epochs).
    //
    // Scale shape: the ONLY corpus-sized work is the per-unit token count
    // (one partial-aggregated groupBy); everything after runs on #units
    // rows (windows over a ≤ #langs·#sources frame). At 100 TB the unit
    // table is still tiny — the algorithm is exactly as driver-friendly as
    // the 256-bucket DSIR model above.
    GraftQuery(
      "q_unimax_alloc",
      "UniMax epoch-capped token-budget waterfilling across (lang, source) units",
      (s, dir) => {
        // the window runs on the #units aggregate (≤ #langs·#sources rows
        // by construction) — partitioned by a constant so the plan doesn't
        // carry a partition-less WindowExec (the paginate rule; here the
        // single partition is the design, not an accident)
        val W  = org.apache.spark.sql.expressions.Window
        val w  = W.partitionBy(lit(0)).orderBy(col("cap"), col("lang"), col("source"))
        val wp = w.rowsBetween(W.unboundedPreceding, -1)
        // the unit table is consumed by three branches (totals, flagging,
        // final output) — LAZY checkpoints truncate the lineage so the
        // corpus-sized token count runs ONCE at first action, not once per
        // branch (the saltedSides discipline); both pinned frames are
        // ≤ #langs·#sources rows, freed with the result by GC
        val units = Tables.documents(s, dir)
          .withColumn("ws", expr(s"cast(size($wordsSql) as bigint)"))
          .groupBy("lang", "source")
          .agg(sum("ws").as("tokens"))
          .withColumn("epochs",
            expr(s"1 + ${hash60Sql("concat('epochs:', lang, ':', source)")} % 4"))
          .withColumn("cap", col("epochs") * col("tokens"))
          .localCheckpoint(eager = false)
        val tot = units.agg(
          sum("tokens").as("budget"), count(lit(1)).as("n_units"))
        val flagged = units.crossJoin(broadcast(tot))
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("s_before", coalesce(sum("cap").over(wp), lit(0L)))
          .withColumn("capped",
            (col("cap") * (col("n_units") - col("i") + 1) <=
              col("budget") - col("s_before")).cast("long"))
          .localCheckpoint(eager = false)
        val level = flagged
          .agg(sum(expr("capped * cap")).as("cap_sum"), sum("capped").as("m"),
            first("budget").as("b"), first("n_units").as("n"))
          .select(expr("if(n > m, (b - cap_sum) div (n - m), null)").as("theta"))
        flagged.crossJoin(broadcast(level))
          .withColumn("alloc", expr("if(capped = 1, cap, theta)"))
          .withColumn("eff_epochs_bp", expr("(10000 * alloc) div tokens"))
          .select("lang", "source", "tokens", "epochs", "cap", "capped",
            "alloc", "eff_epochs_bp")
          .orderBy("lang", "source")
      },
      Some(s"""WITH u AS (
              |  SELECT lang, source, CAST(sum(len($duckWordsSql)) AS BIGINT) AS tokens
              |  FROM documents GROUP BY lang, source),
              |caps AS (
              |  SELECT lang, source, tokens,
              |         1 + ${duckHash60Sql("'epochs:' || lang || ':' || source")} % 4 AS epochs,
              |         (1 + ${duckHash60Sql("'epochs:' || lang || ':' || source")} % 4) * tokens AS cap
              |  FROM u),
              |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS budget,
              |               count(*) AS n_units FROM caps),
              |flagged AS (
              |  SELECT c.*, t.budget, t.n_units,
              |         row_number() OVER (ORDER BY cap, lang, source) AS i,
              |         coalesce(sum(cap) OVER (ORDER BY cap, lang, source
              |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_before
              |  FROM caps c, tot t),
              |fl AS (
              |  SELECT *, CASE WHEN cap * (n_units - i + 1) <= budget - s_before
              |                 THEN 1 ELSE 0 END AS capped FROM flagged),
              |lvl AS (
              |  SELECT CASE WHEN max(n_units) > sum(capped)
              |              THEN (max(budget) - sum(capped * cap)) // (max(n_units) - sum(capped))
              |         END AS theta
              |  FROM fl)
              |SELECT lang, source, tokens, CAST(epochs AS BIGINT) AS epochs, cap,
              |       CAST(capped AS BIGINT) AS capped,
              |       CAST(CASE WHEN capped = 1 THEN cap ELSE theta END AS BIGINT) AS alloc,
              |       (10000 * CAST(CASE WHEN capped = 1 THEN cap ELSE theta END AS BIGINT)) // tokens AS eff_epochs_bp
              |FROM fl, lvl ORDER BY lang, source""".stripMargin)
    ),

    // E3ad score calibration: quantile-normalize the heuristic quality
    // score (stopword density) into a percentile calibration TABLE — the
    // stage that makes a threshold transferable across corpora ("drop the
    // bottom 30%" instead of "drop score < 130", which means different
    // things on different crawls). Histogram-FIRST, the scale-safe form: a
    // global percentile window over raw docs would funnel the corpus
    // through one sort; quantizing the score into 250-bp-wide buckets
    // first makes the cumulative window run over ≤ 41 bucket rows
    // regardless of corpus size, and a 100 TB run broadcasts the resulting
    // table back to assign per-doc percentiles. Same altitude as
    // q_token_quantiles but the inverse direction: that reads quantile →
    // value, this reads value → percentile.
    GraftQuery(
      "q_score_calibrate",
      "percentile calibration table of the stopword-density quality score",
      (s, dir) =>
        // hist feeds both the totals branch and the calibration rows — the
        // lazy checkpoint (≤ 41 bucket rows) keeps the corpus scan single
        calibrationFrom(
          scoreHistogram(Tables.documents(s, dir)).localCheckpoint(eager = false)),
      Some {
        val allStops = Markers.flatMap(_._2).distinct
        s"""WITH d AS (
           |  SELECT (10000 * ${duckScoreSql(allStops)})
           |           // greatest(len(words), 1) AS score_bp
           |  FROM (SELECT $duckWordsSql AS words FROM documents) t),
           |hist AS (
           |  SELECT CAST(score_bp // 250 AS BIGINT) AS bucket,
           |         count(*) AS n
           |  FROM d GROUP BY 1),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs FROM hist)
           |SELECT bucket, n,
           |       CAST(sum(n) OVER (ORDER BY bucket
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
           |       (10000 * (CAST(sum(n) OVER (ORDER BY bucket
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n)) // n_docs AS pctl_lo_bp,
           |       (10000 * CAST(sum(n) OVER (ORDER BY bucket
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) // n_docs AS pctl_hi_bp
           |FROM hist, tot ORDER BY bucket""".stripMargin
      }
    ),

    // E3af Gopher-style rule filter (Rae et al. 2021, Appendix A1.1): the
    // battery of cheap per-document heuristics a pre-training corpus is
    // gated on BEFORE any model-based scoring — word-count bounds, mean
    // word length bounds, stopword presence, and a top-word repetition cap
    // — each reported as its own bit so a curation run can audit WHICH rule
    // killed a document, plus the conjunction. Thresholds are corpus-scaled
    // constants (a deployment sets the paper's 50..100k etc.); every signal
    // is exact integer arithmetic (milli-units, no ratios through floats).
    //
    // Scale shape: entirely ROW-LOCAL array lambdas inside the one
    // documents scan — no shuffle before the output sort. The top-word
    // count is O(|distinct| · |words|) per row, bounded by the document
    // length squared at worst and by vocab · length in practice.
    GraftQuery(
      "q_gopher_rules",
      "Gopher-style per-doc rule bits: word count, mean word length, stopwords, top-word cap",
      (s, dir) => {
        val stops = inList(Markers.flatMap(_._2).distinct.sorted)
        Tables.documents(s, dir)
          .withColumn("words", expr(wordsSql))
          .withColumn("n_words", expr("cast(size(words) as bigint)"))
          .withColumn("mean_len_milli", expr(
            "(1000 * aggregate(words, cast(0 as bigint), (acc, w) -> acc + char_length(w)))" +
              " div greatest(n_words, 1)"))
          .withColumn("n_stop", expr(
            s"cast(size(filter(array($stops), sw -> array_contains(words, sw))) as bigint)"))
          .withColumn("top_milli", expr(
            "(1000 * cast(array_max(transform(array_distinct(words), " +
              "u -> size(filter(words, x -> x = u)))) as bigint)) div greatest(n_words, 1)"))
          .withColumn("r_count", expr(
            s"cast(if(n_words between $GopherMinWords and $GopherMaxWords, 1, 0) as bigint)"))
          .withColumn("r_len", expr(
            "cast(if(mean_len_milli between 3000 and 10000, 1, 0) as bigint)"))
          .withColumn("r_stop", expr("cast(if(n_stop >= 2, 1, 0) as bigint)"))
          .withColumn("r_rep", expr(
            s"cast(if(top_milli <= $GopherTopMilli, 1, 0) as bigint)"))
          .withColumn("pass", expr("r_count * r_len * r_stop * r_rep"))
          .select("doc_id", "n_words", "mean_len_milli", "n_stop", "top_milli",
            "r_count", "r_len", "r_stop", "r_rep", "pass")
          .orderBy("doc_id")
      },
      Some {
        val stops = inList(Markers.flatMap(_._2).distinct.sorted)
        s"""WITH d AS (SELECT doc_id, $duckWordsSql AS words FROM documents),
           |m AS (
           |  SELECT doc_id,
           |    CAST(len(words) AS BIGINT) AS n_words,
           |    (1000 * CAST(coalesce(list_sum(list_transform(words, w -> len(w))), 0) AS BIGINT))
           |      // greatest(CAST(len(words) AS BIGINT), 1) AS mean_len_milli,
           |    CAST(len(list_filter([$stops], sw -> list_contains(words, sw))) AS BIGINT) AS n_stop,
           |    (1000 * CAST(list_max(list_transform(list_distinct(words),
           |        u -> len(list_filter(words, x -> x = u)))) AS BIGINT))
           |      // greatest(CAST(len(words) AS BIGINT), 1) AS top_milli
           |  FROM d)
           |SELECT doc_id, n_words, mean_len_milli, n_stop, top_milli,
           |  CAST(CASE WHEN n_words BETWEEN $GopherMinWords AND $GopherMaxWords THEN 1 ELSE 0 END AS BIGINT) AS r_count,
           |  CAST(CASE WHEN mean_len_milli BETWEEN 3000 AND 10000 THEN 1 ELSE 0 END AS BIGINT) AS r_len,
           |  CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
           |  CAST(CASE WHEN top_milli <= $GopherTopMilli THEN 1 ELSE 0 END AS BIGINT) AS r_rep,
           |  CAST(CASE WHEN n_words BETWEEN $GopherMinWords AND $GopherMaxWords THEN 1 ELSE 0 END
           |     * CASE WHEN mean_len_milli BETWEEN 3000 AND 10000 THEN 1 ELSE 0 END
           |     * CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END
           |     * CASE WHEN top_milli <= $GopherTopMilli THEN 1 ELSE 0 END AS BIGINT) AS pass
           |FROM m ORDER BY doc_id""".stripMargin
      }
    ),

    // E3ag unigram-entropy diversity score: the integer floor-log2 skeleton
    // of per-document Shannon entropy over word frequencies —
    // H ≈ Σ_u c_u · (⌊log2 n⌋ − ⌊log2 c_u⌋) in milli-bits per token. Low
    // entropy = template/boilerplate text (the complement of E3i's
    // repeated-2-gram signal: entropy catches "same few words shuffled",
    // repetition catches "same phrase verbatim"). floor(log2 x) =
    // length(bin(x)) − 1 in both engines, so like q_lm_score the score
    // never touches a transcendental two engines could round differently.
    //
    // Scale shape: entirely ROW-LOCAL — the frequency histogram is an array
    // lambda over the words array, never a shuffle; one scan, output sort
    // only. The E3a-style per-language rollup composes downstream if wanted.
    GraftQuery(
      "q_word_entropy",
      "per-doc unigram diversity: integer-log2 Shannon skeleton, milli-bits per token",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("words", expr(wordsSql))
          .withColumn("n_words", expr("cast(size(words) as bigint)"))
          .withColumn("n_distinct", expr("cast(size(array_distinct(words)) as bigint)"))
          .withColumn("ent_total", expr(
            "aggregate(transform(array_distinct(words), " +
              "u -> cast(size(filter(words, x -> x = u)) as bigint)), " +
              "cast(0 as bigint), (acc, c) -> acc + c * " +
              "((length(bin(n_words)) - 1) - (length(bin(c)) - 1)))"))
          .withColumn("ent_milli", expr("(1000 * ent_total) div greatest(n_words, 1)"))
          .select("doc_id", "n_words", "n_distinct", "ent_total", "ent_milli")
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, $duckWordsSql AS words FROM documents),
              |m AS (
              |  SELECT doc_id,
              |    CAST(len(words) AS BIGINT) AS n_words,
              |    CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
              |    CAST(coalesce(list_sum(list_transform(
              |      list_transform(list_distinct(words),
              |        u -> len(list_filter(words, x -> x = u))),
              |      c -> c * ((length(bin(CAST(len(words) AS BIGINT))) - 1)
              |              - (length(bin(CAST(c AS BIGINT))) - 1)))), 0) AS BIGINT) AS ent_total
              |  FROM d)
              |SELECT doc_id, n_words, n_distinct, ent_total,
              |       (1000 * ent_total) // greatest(n_words, 1) AS ent_milli
              |FROM m ORDER BY doc_id""".stripMargin)
    ),

    // E3ab per-source DISTINCTIVE terms — c-TF-IDF at source granularity
    // (the corpus-exploration move behind topic labeling à la BERTopic):
    // what does THIS source talk about that the others don't. tf = term
    // count within the source; idf = the integer floor-log2 skeleton
    // (length(bin(x))−1, exact in both engines — the q_word_entropy idiom;
    // a float log could diverge by an ulp at bucket boundaries) of
    // (S·256) div df, CENTERED so a term present in every source scores
    // exactly 0 and drops out of the ranking — ubiquitous terms eliminated
    // by arithmetic, not a stopword list. Top-5 per source by rank over a
    // PARTITIONED window (WindowGroupLimit keeps it pre-shuffle top-k).
    //
    // Scale shape: one explode scan, two hash aggregates ((source, term)
    // then term), a vocab-keyed join, a bounded-output window. The (source,
    // term) grain is the same bounded state the domain rollup rides.
    GraftQuery(
      "q_tfidf_terms",
      "per-source top-5 c-TF-IDF terms (integer floor-log2 idf, ubiquitous terms zeroed)",
      (s, dir) => {
        val toks = Tables.spread(Tables.documents(s, dir))
          .select(col("source"), explode(expr(wordsSql)).as("w"))
          .filter(col("w") =!= "")
        val tf  = toks.groupBy("source", "w").agg(count(lit(1)).as("tf"))
        val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val ns  = tf.select("source").distinct().agg(count(lit(1)).as("ns"))
        val w   = Window.partitionBy("source").orderBy(col("score").desc, col("w").asc)
        tf.join(dfT, "w")
          .crossJoin(broadcast(ns))
          .withColumn("score", expr("tf * (length(bin((ns * 256L) div df)) - 9)"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("source"), col("rk").cast("long").as("rk"),
            col("w").as("term"), col("tf"), col("score").cast("long").as("score"))
          .orderBy("source", "rk")
      },
      Some(s"""WITH toks AS (
              |  SELECT source, unnest($duckWordsSql) AS w FROM documents),
              |t AS (SELECT source, w FROM toks WHERE w <> ''),
              |tf AS (SELECT source, w, count(*) AS tf FROM t GROUP BY 1, 2),
              |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
              |ns AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS ns FROM tf),
              |sc AS (
              |  SELECT tf.source, tf.w, tf.tf,
              |         tf.tf * (length(bin((ns.ns * 256) // df.df)) - 9) AS score
              |  FROM tf JOIN df USING (w), ns),
              |rk AS (
              |  SELECT source, w, tf, score,
              |         row_number() OVER (PARTITION BY source ORDER BY score DESC, w) AS rk
              |  FROM sc)
              |SELECT source, CAST(rk AS BIGINT) AS rk, w AS term,
              |       CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score
              |FROM rk WHERE rk <= 5 ORDER BY source, rk""".stripMargin)
    )
  )

  /** The 250-bp score-bucket histogram of `docs` (any frame with a `text`
    * column): (bucket, n), ≤ 41 rows. Single-sourced between the graded
    * calibration query and the streaming form
    * ([[graft.streaming.Sketches.updateScoreHist]]) — counts are an
    * addition monoid, so streamed batch histograms merge associatively.
    */
  private[graft] def scoreHistogram(docs: DataFrame): DataFrame = {
    val allStops = Markers.flatMap(_._2).distinct
    docs
      .withColumn("words", expr(wordsSql))
      .withColumn("score_bp", expr(
        s"(10000 * ${scoreSql(allStops)}) div greatest(size(words), 1)"))
      .groupBy(expr("cast(score_bp div 250 as bigint)").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** The calibration table over a (bucket, n) histogram frame — cumulative
    * counts and percentile bounds, all windows on the ≤ 41 bucket rows.
    */
  private[graft] def calibrationFrom(hist: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(lit(0)).orderBy(col("bucket"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val tot = hist.agg(sum("n").as("n_docs"))
    hist.crossJoin(broadcast(tot))
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("pctl_lo_bp", expr("(10000 * (cum_n - n)) div n_docs"))
      .withColumn("pctl_hi_bp", expr("(10000 * cum_n) div n_docs"))
      .select("bucket", "n", "cum_n", "pctl_lo_bp", "pctl_hi_bp")
      .orderBy("bucket")
  }

  /** Distinct (source, sh) 3-gram shingle sets of a documents-shaped frame —
    * E3ai's sketch domain, single-sourced for the graded query and the
    * merge-property spec.
    */
  private[graft] def hllShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), expr(Dialect.wordsSql).as("words"))
      .filter(expr("size(words) >= 3"))
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(words) - 2), " +
          "i -> concat_ws(' ', words[i - 1], words[i], words[i + 1]))")).as("sh"))
      .distinct()

  /** (source, j, r) HLL registers over a (source, sh) frame: bucket j =
    * h % 64, rank r = leading-zero position of the 54-bit remainder
    * (integer-exact via `length(bin(v))`), max-combined per bucket. Max is
    * associative/commutative/idempotent, so registers computed on ANY
    * partition of the corpus merge by max into exactly the full-corpus
    * registers — the property that makes HLL the 1000-executor distinct
    * counter, pinned in SketchesSpec.
    */
  private[graft] def hllRegistersOf(sh: DataFrame): DataFrame =
    sh
      .select(col("source"), expr(Dialect.hash60Sql("sh")).as("h"))
      // no distinct here: duplicate hashes land the same rho in the same
      // register, and max is idempotent — the groupBy below collapses them
      // for free, where an explicit distinct cost a full (source, h)
      // exchange for byte-identical registers
      .select(col("source"), expr("cast(h % 64 as int)").as("j"),
        expr("h div 64").as("v"))
      .withColumn("rho",
        expr("least(case when v = 0 then 55 else 55 - length(bin(v)) end, 40)"))
      .groupBy("source", "j").agg(max(col("rho")).as("r"))

  /** (source, n_zero, est) from a (source, j, r) register frame — E3ai's
    * integer-exact estimator stage (harmonic sum in the 2^40 scale, alpha
    * as 709/1000, one exact division), shared by the graded query and the
    * streaming reader ([[graft.streaming.Sketches.hllDistinct]]). Empty
    * registers contribute 2^(40−0) each. Small-range inputs (raw estimate
    * ≤ [[HllLcThreshold]] with n_zero > 0) take the linear-counting branch
    * — a [[HllLcTable]] lookup by n_zero (VERDICT r9 #3: previously a
    * documented deployment note, now code on BOTH engines' paths).
    */
  private[graft] def hllEstimateFrom(regs: DataFrame): DataFrame =
    regs.groupBy("source")
      .agg(sum(expr("shiftleft(1L, 40 - r)")).as("sp"), count(lit(1)).as("nb"))
      .select(col("source"),
        (col("sp") + (lit(64L) - col("nb")) * lit(1099511627776L)).as("spow"),
        (lit(64L) - col("nb")).as("n_zero"))
      .withColumn("raw_est",
        expr("(709L * 4096L * 1099511627776L) div (1000L * spow)"))
      .withColumn("est",
        expr(s"if(n_zero > 0 and raw_est <= $HllLcThreshold, " +
          s"element_at(${HllLcTable.mkString("array(", "L, ", "L)")}, " +
          "cast(n_zero as int)), raw_est)"))
      .select("source", "n_zero", "est")

  /** The DSIR gram stream: (doc_id, is_t, bucket) — one row per bigram, is_t
    * flags the target-domain (lang='en') slice, bucket is the shared 60-bit
    * hash folded into the 256-bucket feature space. Single-sourced so the
    * graded query and the streaming model ([[graft.streaming.Sketches
    * .updateDsirModel]]) cannot drift on the feature construction.
    */
  private[graft] def dsirGrams(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), expr(Dialect.wordsSql).as("words"))
      .filter(expr("size(words) >= 2"))
      .select(col("doc_id"),
        expr("if(lang = 'en', cast(1 as bigint), cast(0 as bigint))").as("is_t"),
        explode(expr(
          "transform(sequence(1, size(words) - 1), " +
            "i -> concat_ws(' ', words[i - 1], words[i]))")).as("gram"))
      .withColumn("bucket", expr(s"${Dialect.hash60Sql("gram")} % 256"))
      .select("doc_id", "is_t", "bucket")

  /** The constant-size importance model: per-bucket raw and target counts
    * (≤ 256 rows no matter the corpus). Counts form an addition monoid, so
    * streamed batch models merge associatively — the property the streaming
    * form rides.
    */
  private[graft] def dsirModel(grams: DataFrame): DataFrame =
    grams.groupBy("bucket")
      .agg(count(lit(1)).as("r_b"), sum(col("is_t")).as("t_b"))

  /** Integer floor-log2 skeleton of log(p_target/p_raw) over a (bucket,
    * r_b, t_b) model row — the +64 offset keeps every per-gram weight
    * positive (see the q_dsir_select commentary on div-vs-floor).
    */
  private[graft] val dsirLambdaSql =
    "cast(64 + (length(bin(t_b + 1)) - 1) - (length(bin(r_b + 1)) - 1) as bigint)"

  /** Score `grams` against `model` and keep the top `k` documents by
    * per-gram milli-average — the model comes back onto the gram stream as
    * a broadcast (≤ 256 rows), the top-k is TakeOrderedAndProject.
    */
  private[graft] def dsirScore(grams: DataFrame, model: DataFrame, k: Int): DataFrame =
    grams
      .join(broadcast(model.withColumn("lam", expr(dsirLambdaSql))
        .select("bucket", "lam")), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum(col("lam")).as("score"))
      .withColumn("avg_milli", expr("(1000 * score) div n_grams"))
      .select("doc_id", "n_grams", "score", "avg_milli")
      .orderBy(col("avg_milli").desc, col("doc_id"))
      .limit(k)
}

/** The fixed merge list of q_bpe_tokenize and its dialect-shared fuse
  * construction — one source so the Spark side and the DuckDB oracle apply
  * the SAME merges in the SAME order to the SAME wrapped form.
  */
private[graft] object BpeApply {

  /** (left, right) merges, applied in order — th, the, an. */
  val Merges: Seq[(String, String)] = Seq(("t", "h"), ("th", "e"), ("a", "n"))

  /** Chain of non-overlapping replaces over a wrapped-symbols expression:
    * ␟l␟␟r␟ → ␟lr␟ per merge (chr(31) is the symbol delimiter).
    */
  def fusedSql(wrapped: String): String =
    Merges.foldLeft(wrapped) { case (x, (l, r)) =>
      s"replace($x, chr(31) || '$l' || chr(31) || chr(31) || '$r' || chr(31), " +
        s"chr(31) || '$l$r' || chr(31))"
    }
}
