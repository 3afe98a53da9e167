package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** E1 dedup family (SURVEY.md §2.11; BASELINE north star): exact content
  * dedup, MinHash+LSH banding, SimHash fingerprints, n-gram Jaccard, and
  * embedding-cosine near-dup — the LLM-training-pipeline operators the
  * reference's keyed upsert loop (pet_scraper.py:410-466) generalizes into.
  *
  * Scale posture (100 TB): every stage here is a hash-partitioned shuffle on
  * a derived key (content hash, LSH band, source bucket, label bucket) — the
  * pairwise work only ever happens WITHIN a bucket, never across the corpus.
  * No driver-side state, no global windows, no cross joins.
  *
  * Oracle parity notes:
  *  - all hashes go through the md5-based 60-bit [[graft.functions.Scalars.hexHash60]]
  *    construction, which DuckDB reproduces exactly;
  *  - embedding math quantizes floats to integers FIRST (`round(x*1000)`), so
  *    dot products and norms are exact integer arithmetic — order-independent
  *    and bit-identical in both engines (SURVEY.md §7.4#2's float-sum risk
  *    eliminated rather than papered over with rounding).
  *
  * Cache discipline (ADVICE r5): queries that persist shared lineage
  * (shingles, signatures, candidates) deliberately do NOT unpersist — the
  * returned DataFrame still references the cached plans, so eager unpersist
  * would re-run the pipeline on the consumer's first action. The Bench
  * harness clears all caches between timed queries; other runners (Verify,
  * specs) rely on executor-storage LRU eviction, which is safe because each
  * runner is a bounded one-process session and the cached rows are derived
  * aggregates, not corpus text.
  */
object DedupQueries {

  import Dialect.{duckHash60Sql => duckHash60, duckGramsSql, duckShinglesSql, duckWordsSql, hash60Sql, wordsSql}

  /** MinHash permutation salts: first 15 hex chars of md5("0").."md5("7")
    * parsed base-16 (same construction as [[hash60Sql]], precomputed so the
    * salt is NOT re-hashed per shingle). All < 2^60, so `h ^ salt` stays a
    * non-negative 60-bit value in both engines.
    */
  private val Salts: Seq[Long] = Seq(
    935853755618645598L, 886263699231969848L, 901255563090117366L,
    1066434503623691823L, 758855882668719729L, 1030659900335514164L,
    101208472399937786L, 644382284193898855L)
  private val saltList: String = Salts.mkString(", ")

  /** LSH hot-bucket cap — pairs are only expanded inside buckets of at most
    * this many members (degenerate buckets would otherwise go |bucket|²).
    */
  private[graft] val MaxBucket = 50

  /** Bloom geometry for the prefiltered decontamination (E1f3): m bits, k
    * salted hashes. Sized so the test corpus's ~3k bench shingles load the
    * filter enough that the false-positive branch is exercised (see the
    * query doc); a deployment sizes m ≈ 1.44·k·n for its benchmark.
    */
  private[graft] val BloomBits = 8192L
  private[graft] val BloomK    = 3

  /** The k salted bit positions of a `shingle` column — single-sourced for
    * the graded query, its oracle twin (via the same salt strings), and the
    * streaming [[graft.streaming.Sketches.updateBloom]] merge (a drifting
    * salt would silently split the filter).
    */
  private[graft] def bloomPosCols: org.apache.spark.sql.Column =
    array((0 until BloomK).map(j =>
      expr(s"(${hash60Sql(s"concat('bloom$j:', shingle)")}) % $BloomBits")): _*)

  /** Suffix-prefix cap (tokens materialized per suffix) and minimum
    * reportable span length for the suffix-ordered dup-span query
    * (q_longest_dup_span). SfxK bounds the per-row payload AND the
    * reportable span; MinSpan must stay ≥ 2 so the leading-2-gram window
    * bucketing stays exact (cross-bucket pairs share < 2 tokens < MinSpan).
    */
  private[graft] val SfxK    = 12
  private[graft] val MinSpan = 3

  /** SimHash blocking rotations: pass p rotates the 32-bit fingerprint left
    * by this many bits before taking the top-16 block. 0 first (identity —
    * keeps the single-pass result a subset of the multi-pass one), then two
    * spreads that move every bit position out of the block in at least one
    * pass.
    */
  private val Rotations = Seq(0, 11, 22)

  /** In-bucket pair expansion over a sorted collected member list: all i < j
    * element pairs of `listCol`, each built by `mk(x, y)` (x before y in
    * sort order, so derived ids satisfy a < b). Single-sourced because the
    * 1-based `slice(l, i + 2, size(l))` arithmetic is subtle and four pair
    * generators depend on it staying identical.
    */
  private[graft] def pairExpansionSql(listCol: String)(mk: (String, String) => String): String =
    s"flatten(transform($listCol, (x, i) -> " +
      s"transform(slice($listCol, i + 2, size($listCol)), y -> ${mk("x", "y")})))"

  /** DuckDB CTE chain shared by the minhash oracles: shingle sets → hashes →
    * signatures → bands → capped buckets → deduped candidate pairs (`cand`).
    */
  private def duckMinhashCtes: String =
    s"""docs AS (
       |  SELECT doc_id, $duckWordsSql AS words FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct($duckShinglesSql) AS shingles
       |  FROM docs WHERE len(words) >= 3),
       |hs AS (
       |  SELECT doc_id, [${duckHash60("x")} for x in shingles] AS sh FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |         [list_min([xor(h, salt) for h in sh]) for salt in [$saltList]] AS sig
       |  FROM hs),
       |bands AS (
       |  SELECT doc_id, b AS bd, md5(sig[2*b+1]::VARCHAR || ',' || sig[2*b+2]::VARCHAR) AS bh
       |  FROM sig, (SELECT unnest(range(0, 4)) AS b) bs),
       |buckets AS (
       |  SELECT bd, bh, list_sort(list(DISTINCT doc_id)) AS ids
       |  FROM bands GROUP BY bd, bh
       |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT la.a AS a, lb.b AS b
       |    FROM (SELECT bd, bh, unnest(ids) AS a FROM buckets) la
       |    JOIN (SELECT bd, bh, unnest(ids) AS b FROM buckets) lb USING (bd, bh)
       |    WHERE la.a < lb.b) p)""".stripMargin

  /** Raw ordered 2-gram rows (doc_id, carry..., gram) — the exploded gram
    * pipeline shared by the jaccard set-similarity join (which dedups them)
    * and the repetition score (which counts repeats). ARRAY-NATIVE: grams
    * are built as a row-local transform over the words array and exploded —
    * the posexplode + lead-window form this replaced paid a full-corpus
    * sort+shuffle just to look one word ahead (r8 profile; value parity
    * pinned in DedupInternalsSpec against the window form). Mirrors
    * [[Dialect.duckGramsSql]].
    */
  private[queries] def gramRows(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val keep = col("doc_id") +: carry.map(col)
    docs
      .select(keep :+ expr(wordsSql).as("words"): _*)
      .filter(expr("size(words) >= 2"))
      .select(keep :+ explode(expr(
        "transform(sequence(1, size(words) - 1), " +
          "i -> concat_ws(' ', words[i - 1], words[i]))")).as("gram"): _*)
  }

  /** (a, b, inter, sa, sb) over the capped non-stop 2-gram sets — the
    * shared construction behind q_ngram_jaccard and q_containment_pairs,
    * which differ only in the MEASURE computed from these five columns
    * (jaccard vs containment). ONE evaluation of the gram pipeline, then
    * ONE (source, gram) aggregate that is simultaneously the gram dedup
    * (collect_set), the stop-gram df cap (set size = doc frequency), and
    * the pair-expansion bucket — the r4 form paid a separate distinct()
    * exchange plus a df window plus a size window over the same data.
    * Sizes come from re-exploding the tiny capped bucket table (each
    * surviving (doc, gram) exactly once), an agg instead of a sort-based
    * window — both sizes and pairs see exactly the surviving-gram sets.
    * Single-sourced with [[duckGramPairCtes]] (the oracle twin) because
    * the cap semantics were a named VERDICT fix: adjusting MaxBucket or
    * the sz derivation in one measure but not the other would grade two
    * different set semantics.
    */
  private def gramPairSizes(s: SparkSession, dir: String,
      phased: Boolean): DataFrame = {
    // the eager stage branches are gated on the QUERY IDENTITY as well as
    // the capture (ADVICE r13 #3): q_ngram_jaccard shares this lineage but
    // is not a PhasedQueries member, and before the `phased` flag a TOOL
    // capture (TimeQ with GRAFT_TIMEQ_CAPTURE=1) of q_ngram_jaccard also
    // fired the counts — paying two extra evaluations and emitting stage
    // names the bench never tracks for that key. Now only the containment
    // caller opts in; jaccard stays lazy under every capture.
    val capturing = phased && graft.Phases.capturing
    val buckets = gramRows(Tables.spread(Tables.documents(s, dir)), Seq("source"))
      .groupBy("source", "gram")
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) <= MaxBucket)
      .persist() // evaluated lazily by the caller; see the file-head note
    // Phase attribution (VERDICT r12 next-step #3), capture-gated like the
    // q_crossmodal_dups stages: under the bench's dedicated diagnostic
    // evaluation of q_containment_pairs ONLY, `gram_agg` materializes the
    // capped (source, gram) bucket table — the shared scan→explode→agg
    // trunk — and `pair_expand` then counts the pre-measure five-column
    // pair frame over that cache, so a trunk regression and a
    // pair-fan-out regression are distinguishable in the round artifact.
    // Outside a capture both branches are identity and the lazy graded
    // plan is byte-identical.
    if (capturing) graft.Phases.timed("gram_agg") { buckets.count(); () }
    val sz = buckets.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = buckets
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(pairExpansionSql("ids")(
        (x, y) => s"named_struct('a', $x, 'b', $y)"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("a"), col("sz").as("sa")), "a")
      .join(sz.select(col("doc_id").as("b"), col("sz").as("sb")), "b")
    if (capturing) {
      graft.Phases.timed("pair_expand") { pairs.count(); () }
      // a capture must leave no stage frame behind (ADVICE r12): the
      // caller's forceFrame re-derives the rows lazily without the cache
      buckets.unpersist()
      ()
    }
    pairs
  }

  /** Oracle twin of [[gramPairSizes]]: the g0/g/sz/pairs CTE chain both
    * gram-pair oracles share (final SELECT supplies the measure).
    */
  private def duckGramPairCtes: String =
    s"""g0 AS (
       |  SELECT doc_id, source,
       |         unnest(list_distinct($duckGramsSql)) AS gram
       |  FROM (SELECT doc_id, source, $duckWordsSql AS words FROM documents) w
       |  WHERE len(words) >= 2),
       |g AS (
       |  SELECT doc_id, source, gram FROM (
       |    SELECT doc_id, source, gram,
       |           count(*) OVER (PARTITION BY source, gram) AS df
       |    FROM g0) d WHERE df <= $MaxBucket),
       |sz AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
       |pairs AS (
       |  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
       |  FROM g l JOIN g r ON l.source = r.source AND l.gram = r.gram
       |                   AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** The lead-window form [[gramRows]] replaced — kept as the parity
    * reference for DedupInternalsSpec only.
    */
  private[graft] def gramRowsViaWindow(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val w    = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val keep = col("doc_id") +: carry.map(col)
    docs
      .select(keep :+ posexplode(expr(wordsSql)).as(Seq("pos", "w")): _*)
      .withColumn("w1", lead(col("w"), 1).over(w))
      .filter(col("w1").isNotNull)
      .select(keep :+ concat_ws(" ", col("w"), col("w1")).as("gram"): _*)
  }

  /** Distinct (doc_id, shingle, h) rows — the 3-gram shingle pipeline shared
    * by the MinHash signature, candidate generation, and exact verification.
    * ARRAY-NATIVE (see [[gramRows]]): the shingle strings are a row-local
    * transform over the words array — and so is the dedup: a (doc_id,
    * shingle) duplicate can only come from the SAME document's array, so
    * `array_distinct` before the explode IS the distinct the contract
    * requires, with ZERO shuffle. The previous `.distinct()` after the
    * explode hash-exchanged the full corpus-sized shingle-string row set
    * once per consumer pipeline (guide §2.4 "remove shuffles outright" —
    * this was the largest removable exchange in the dedup family: ~10
    * graded queries inherit this trunk). Value parity with the window form
    * stays pinned in DedupInternalsSpec.
    */
  private[graft] def shingleRows(docs: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    // `carry` rides doc-level columns (e.g. source) through the row-local
    // pipeline for free — same pattern as [[positionalShingles]]. Without
    // it, the decontamination queries re-attached source by equi-joining
    // the full distinct (doc_id, shingle) set back to documents: a
    // corpus-sized shuffle at the 100 TB posture, paid to recover a column
    // that was in hand before the explode. Carried columns are functions
    // of doc_id, so the (doc_id, shingle) distinct is unchanged by them.
    val keep = col("doc_id") +: carry.map(col)
    docs
      .select(keep :+ expr(wordsSql).as("words"): _*)
      .filter(expr("size(words) >= 3"))
      .select(keep :+ explode(expr(
        "array_distinct(transform(sequence(1, size(words) - 2), " +
          "i -> concat_ws(' ', words[i - 1], words[i], words[i + 1])))")).as("shingle"): _*)
      .withColumn("h", expr(hash60Sql("shingle")))
  }

  /** The double-lead window form [[shingleRows]] replaced — parity
    * reference for DedupInternalsSpec only.
    */
  private[graft] def shingleRowsViaWindow(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"), posexplode(expr(wordsSql)).as(Seq("pos", "w")))
      .withColumn("w1", lead(col("w"), 1).over(w))
      .withColumn("w2", lead(col("w"), 2).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("w"), col("w1"), col("w2")).as("shingle"))
      .distinct()
      .withColumn("h", expr(hash60Sql("shingle")))
  }

  /** Positional 3-gram rows (doc_id, carry..., pos, shingle) — every
    * occurrence with its token position kept: the span-merge twin of
    * [[shingleRows]] (which dedups and drops positions). One source for the
    * posexplode + double-lead construction shared by the two span queries
    * (q_span_decontaminate, q_dup_span_coverage).
    */
  private[graft] def positionalShingles(docs: DataFrame, carry: Seq[String]): DataFrame = {
    // array-native (see gramRows): posexplode over the row-local shingle
    // array reproduces the word-position pos (0-based start of each
    // shingle) without the double-lead window's corpus sort+shuffle
    val keep = col("doc_id") +: carry.map(col)
    docs
      .select(keep :+ expr(wordsSql).as("words"): _*)
      .filter(expr("size(words) >= 3"))
      .select(keep :+ posexplode(expr(
        "transform(sequence(1, size(words) - 2), " +
          "i -> concat_ws(' ', words[i - 1], words[i], words[i + 1]))"))
        .as(Seq("pos", "shingle")): _*)
  }

  /** Window form of [[positionalShingles]] — parity reference for
    * DedupInternalsSpec only.
    */
  private[graft] def positionalShinglesViaWindow(docs: DataFrame, carry: Seq[String]): DataFrame = {
    val w    = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val keep = col("doc_id") +: carry.map(col)
    docs
      .select(keep :+ posexplode(expr(wordsSql)).as(Seq("pos", "w")): _*)
      .withColumn("w1", lead(col("w"), 1).over(w))
      .withColumn("w2", lead(col("w"), 2).over(w))
      .filter(col("w2").isNotNull)
      .select(keep ++ Seq(col("pos"),
        concat_ws(" ", col("w"), col("w1"), col("w2")).as("shingle")): _*)
  }

  /** Matched (doc_id, pos) rows labeled with their island group `g`:
    * positions whose 3-gram coverages touch (gap <= 3 keeps the union
    * contiguous — a 3-gram at p covers [p, p+2], so the next start at p+3
    * is still seamless) share a group. Two doc_id-partitioned window
    * passes over ONE sort; single-sourced because the gap constant and the
    * break rule must agree between the two span queries AND their oracles.
    */
  private def spanIslands(matched: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    matched
      .withColumn("brk", when(lag(col("pos"), 1).over(w).isNull ||
        col("pos") - lag(col("pos"), 1).over(w) > 3, 1L).otherwise(0L))
      .withColumn("g", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** DuckDB twin of [[positionalShingles]] (carry = source): CTEs `docs`
    * (doc_id, source, words) and `ps` (doc_id, source, pos, shingle).
    */
  private def duckPositionalShingleCtes: String =
    s"""docs AS (
       |  SELECT doc_id, source, $duckWordsSql AS words FROM documents),
       |ps AS (
       |  SELECT doc_id, source, i - 1 AS pos,
       |         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
       |  FROM (SELECT doc_id, source, words, unnest(range(1, len(words) - 1)) AS i
       |        FROM docs WHERE len(words) >= 3) t)""".stripMargin

  /** DuckDB twin of [[spanIslands]]: CTEs `isl`/`grp` over a prior CTE
    * `m(doc_id, pos)`.
    */
  private def duckIslandCtes: String =
    """isl AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 3
      |              THEN 1 ELSE 0 END AS brk
      |  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |grp AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      |  FROM isl)""".stripMargin

  /** (doc_id, m0..m7, sz) — 8 xor-salt minhash signatures plus the shingle-set
    * size, all in ONE hash aggregate over the shingle rows (sz rides along so
    * the jaccard verifier doesn't need a second pass over the shingles).
    */
  private[graft] def signatures(shingles: DataFrame): DataFrame = {
    val mins = Salts.zipWithIndex.map { case (salt, i) =>
      min(expr(s"h ^ ${salt}L")).as(s"m$i")
    }
    shingles.groupBy("doc_id")
      .agg(mins.head, (mins.tail :+ count(lit(1)).as("sz")): _*)
  }

  /** [[signatures]] computed array-natively — identical output (doc_id,
    * m0..m7, sz), ZERO shuffles: the row form pays a per-doc window sort
    * (posexplode + two leads), a distinct, and a groupBy — three shuffles —
    * to build per-doc aggregates that are really just array folds over the
    * words column. Shingling, dedup, hashing, and the 8 salted minima all
    * happen inside one whole-stage-codegen projection here; a consumer that
    * needs shingle ROWS (the exact-Jaccard verify join) still uses
    * [[shingleRows]]. Value parity with the row form is pinned by
    * DedupInternalsSpec. `sequence(1, n)` needs n >= 1, so docs with < 3
    * words are filtered first — same population as the row form, where the
    * double-lead filter drops them.
    */
  private[graft] def rowSignatures(docs: DataFrame): DataFrame =
    signatures(shingleRows(docs))

  private[graft] def arraySignatures(docs: DataFrame): DataFrame = {
    val mins = Salts.zipWithIndex.map { case (salt, i) =>
      expr(s"array_min(transform(hs, h -> h ^ ${salt}L))").as(s"m$i")
    }
    docs
      .select(col("doc_id"), expr(wordsSql).as("words"))
      .filter(expr("size(words) >= 3"))
      .select(col("doc_id"), expr(
        "transform(sequence(1, size(words) - 2), " +
          "i -> concat_ws(' ', words[i - 1], words[i], words[i + 1]))").as("sh"))
      // NO array_distinct before the mins: min over the raw shingle
      // multiset equals min over the distinct set, so dedup would be pure
      // cost there. sz (count of DISTINCT shingles, used by the Jaccard
      // verify) still dedups — and Catalyst prunes it when unused.
      .select(col("doc_id"), expr(s"transform(sh, x -> ${hash60Sql("x")})").as("hs"),
        expr("cast(size(array_distinct(sh)) as bigint)").as("sz"))
      .select(col("doc_id") +: mins :+ col("sz"): _*)
  }

  /** (doc_id, band, bh) — the 4 LSH band hashes of each signature row. */
  private[graft] def bandRows(sig: DataFrame): DataFrame = {
    val bandExprs = (0 until 4).map(b =>
      md5(concat(col(s"m${2 * b}").cast("string"), lit(","),
        col(s"m${2 * b + 1}").cast("string"))))
    sig.select(col("doc_id"),
      posexplode(array(bandExprs: _*)).as(Seq("band", "bh")))
  }

  /** Candidate pair (a, b) generation from signatures: 4 bands of 2 →
    * capped (band, bh) buckets → in-bucket expansion, deduped.
    */
  private def candidatePairs(sig: DataFrame): DataFrame = {
    val buckets = bandRows(sig).groupBy("band", "bh")
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
    buckets
      .select(explode(expr(pairExpansionSql("ids")(
        (x, y) => s"named_struct('a', $x, 'b', $y)"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Candidate pairs straight from docs through the ZERO-shuffle
    * [[arraySignatures]] form — the row-form twin
    * `candidatePairs(signatures(shingleRows(docs)))` pays a (doc_id)
    * signature exchange over the exploded shingle rows for aggregates that
    * are really row-local array folds (guide §2.4; parity pinned in
    * DedupInternalsSpec).
    */
  private def minhashCandidates(docs: DataFrame): DataFrame =
    candidatePairs(arraySignatures(docs))

  /** The shared candidate→exact-verify lineage behind q_minhash_verified,
    * q_dedup_curve, and q_minhash_error — each grades a different MEASURE
    * (jaccard filter, operating curve, estimator error) over the SAME
    * construction: persisted shingle rows (the scan → explode → distinct →
    * md5 pipeline is referenced by the signature aggregate AND both sides
    * of the intersection join — persist or every reference re-runs it, the
    * materialize-once move ADVICE r2 asked for; `sz` rides inside the
    * signature aggregate so set sizes cost no extra pass), persisted
    * signatures, the capped candidate pairs, and the per-pair exact
    * intersection count. One source, because the persist discipline and
    * the two-sided intersection join must not drift between the three
    * graded consumers.
    */
  private final case class VerifyLineage(sig: DataFrame, cand: DataFrame,
      inter: DataFrame)

  private def verifyLineage(s: SparkSession, dir: String): VerifyLineage = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val sig  = arraySignatures(docs).persist()
    val cand = candidatePairs(sig).persist()
    // exact verify via per-doc DISTINCT shingle ARRAYS intersected
    // row-locally: `inter` = |A ∩ B| of two distinct string sets, exactly
    // the row count the previous two-sided (doc_id, shingle) equi-join
    // chain aggregated — but the joins now move one array row per doc
    // instead of one row per shingle occurrence, and the corpus-sized
    // string-row shuffle disappears (guide §2.3 "shuffle keys and metadata
    // instead of payloads"). Zero-intersection candidates now surface as
    // inter = 0 rows instead of absent rows; every consumer left-joins and
    // coalesces to 0, so the measures are unchanged. `sets` is row-local
    // (no shuffle), recomputed per join side — cheaper than persisting the
    // exploded shingle rows it replaces.
    val sets = docs
      .select(col("doc_id"), expr(wordsSql).as("words"))
      .filter(expr("size(words) >= 3"))
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, size(words) - 2), " +
          "i -> concat_ws(' ', words[i - 1], words[i], words[i + 1])))").as("sh"))
    val inter = cand
      .join(sets.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
      .join(sets.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      .select(col("a"), col("b"),
        expr("cast(size(array_intersect(sha, shb)) as bigint)").as("inter"))
    VerifyLineage(sig, cand, inter)
  }

  /** Test-only: the clique pair edges for the component-parity pin in
    * DedupInternalsSpec (the graded path uses [[bucketStarEdges]]).
    */
  private[graft] def pairEdgesForTest(sig: DataFrame): DataFrame =
    candidatePairs(sig).select("a", "b")

  /** Per-bucket star edges (member → bucket min): the min-label seeding
    * pre-pass for component canonicalization (VERDICT r6 next-step #1).
    * Buckets are kept WHOLE or dropped (size 2..MaxBucket — same filter as
    * [[candidatePairs]]), so inside every surviving bucket the full clique
    * exists in the pair set; connecting each member to the bucket minimum
    * therefore yields EXACTLY the clique's connectivity at O(size) edges
    * instead of O(size²), and the resulting graph is a union of stars whose
    * contraction converges in 1–2 alternating rounds instead of re-deriving
    * the bucket structure edge by edge. May emit the same (a, b) from two
    * buckets and self-loops for the min member — the consumer
    * (connectedAlternating) filters and dedups its input anyway, so a
    * distinct here would only duplicate that shuffle.
    */
  private[graft] def bucketStarEdges(sig: DataFrame): DataFrame =
    bandRows(sig).groupBy("band", "bh")
      .agg(collect_set(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
      .select(explode(col("ids")).as("a"), array_min(col("ids")).as("b"))

  /** (doc_id, simhash) — the shared relational SimHash computation (one md5
    * per distinct word, 32 vote sums in one hash aggregate).
    */
  private def simhashDf(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val votes = (0 until 32).map(b =>
      sum(expr(s"((shiftright(h, $b) & 1) * 2) - 1")).as(s"v$b"))
    val bits = (0 until 32).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr(s"array_distinct($wordsSql)")).as("w"))
      .withColumn("h", expr(hash60Sql("w")))
      .groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ + _).as("simhash"))
  }

  /** DuckDB twin of [[simhashDf]] as a CTE body. */
  private def duckSimhashSql: String =
    s"""SELECT doc_id,
       |  CAST(list_sum([
       |    CASE WHEN CAST(list_sum([(((h >> b) & 1) * 2) - 1 for h in wh]) AS BIGINT) > 0
       |         THEN (1::BIGINT << b) ELSE 0 END
       |    for b in range(0, 32)]) AS BIGINT) AS simhash
       |FROM (SELECT doc_id,
       |        [${duckHash60("w")} for w in list_distinct($duckWordsSql)] AS wh
       |      FROM documents) t""".stripMargin


  import Dialect.{duckQuantSql, quantSql}

  val queries: Seq[GraftQuery] = Seq(

    // E1a exact dedup: content-hash groupBy keeps the lowest doc_id per hash.
    // The content key is a 60-char canonical prefix (the testdata's synthetic
    // near-dups share prefixes; raw texts are all distinct). One shuffle on
    // the hash; the window is partitioned by it, so parallel at any scale.
    GraftQuery(
      "q_dedup_exact",
      "exact dedup by canonical-prefix md5; keep first doc_id, count dups",
      (s, dir) => {
        val withHash = Tables.documents(s, dir)
          .withColumn("content_hash", md5(substring(coalesce(col("text"), lit("")), 1, 60)))
        val w = Window.partitionBy(col("content_hash"))
        withHash
          .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
          .withColumn("dup_count", count(lit(1)).over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("content_hash"), col("dup_count"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, content_hash, dup_count FROM (
             |  SELECT doc_id, content_hash,
             |         row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn,
             |         count(*) OVER (PARTITION BY content_hash) AS dup_count
             |  FROM (SELECT doc_id, md5(substr(coalesce(text, ''), 1, 60)) AS content_hash
             |        FROM documents) h) t
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin)
    ),

    // E1b MinHash + LSH banding: 3-word shingles → one 60-bit content hash per
    // shingle → 8 minhashes as min over XOR-salt permutations → 4 bands of 2
    // → candidate pairs are docs sharing any band bucket.
    //
    // 100 TB shape (and the r2 fix — this query was 970s of a 1002s bench):
    // fully RELATIONAL, no array-lambda pipelines. Catalyst collapses chained
    // array `withColumn`s into downstream expressions, so `element_at(sig,…)`
    // in the band step would re-evaluate the whole signature pipeline per
    // access — a multiplicative interpreted-expression blowup. Exploding to
    // shingle ROWS instead keeps every step (window lead, md5, min-aggregate)
    // inside whole-stage codegen, each computed exactly once: one md5 per
    // distinct shingle, 8 XORs per shingle, one hash-agg per doc. The pair
    // stage is a groupBy on (band, bh) with in-bucket expansion — no
    // self-join recompute — and hot buckets are capped at 50 members
    // (mirrored in the oracle), the standard LSH guard against degenerate
    // buckets turning |bucket|² quadratic.
    GraftQuery(
      "q_dedup_minhash",
      "MinHash-LSH candidate near-dup pairs (3-shingles, 8 xor-perm hashes, 4 bands)",
      (s, dir) => minhashCandidates(Tables.spread(Tables.documents(s, dir))).orderBy("a", "b"),
      Some(s"""WITH $duckMinhashCtes
              |SELECT a, b FROM cand ORDER BY a, b""".stripMargin)
    ),

    // E1b2 the canonical two-stage near-dup pipeline: LSH generates
    // candidates, EXACT shingle-set jaccard verifies them — the composition
    // every production dedup run uses (LSH alone over-generates; exact
    // jaccard alone is |corpus|²). Verification joins shingle ROWS through
    // the tiny candidate set, so the expensive exact math runs only on
    // pairs that already collided in a band bucket.
    GraftQuery(
      "q_minhash_verified",
      "minhash candidates verified by exact shingle jaccard >= 0.5",
      (s, dir) => {
        val vl = verifyLineage(s, dir)
        vl.cand
          .join(vl.inter, Seq("a", "b"), "left")
          .join(vl.sig.select(col("doc_id").as("a"), col("sz").as("sa")), "a")
          .join(vl.sig.select(col("doc_id").as("b"), col("sz").as("sb")), "b")
          .withColumn("jac", round(coalesce(col("inter"), lit(0L)).cast("double") /
            (col("sa") + col("sb") - coalesce(col("inter"), lit(0L))), 4))
          .filter(col("jac") >= 0.5)
          .select(col("a"), col("b"), col("jac"))
          .orderBy("a", "b")
      },
      Some(s"""WITH $duckMinhashCtes,
              |ver AS (
              |  SELECT c.a, c.b,
              |         round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
              |               / len(list_distinct(list_concat(x.shingles, y.shingles))), 4) AS jac
              |  FROM cand c
              |  JOIN sh x ON x.doc_id = c.a
              |  JOIN sh y ON y.doc_id = c.b)
              |SELECT a, b, jac FROM ver WHERE jac >= 0.5 ORDER BY a, b""".stripMargin)
    ),

    // E1b3 the dedup OPERATING CURVE: how many pairs fire and how many
    // documents would be removed at each candidate similarity threshold —
    // the artifact a pipeline team actually tunes against before picking
    // "0.7" (too low deletes paraphrases, too high keeps templates). One
    // exact-jaccard pass over the capped candidate set (the expensive
    // stage runs ONCE, not once per threshold), in integer basis points;
    // removal counts use the keep-lowest-id convention (a doc is removed
    // iff it appears as the HIGHER id of a firing pair) — the same greedy
    // rule q_dedup_exact's keeper choice uses. Four threshold rows via a
    // 4-literal explode over the tiny verified-pair set.
    GraftQuery(
      "q_dedup_curve",
      "pairs fired + docs removed at jaccard thresholds 0.3/0.5/0.7/0.9",
      (s, dir) => {
        val vl = verifyLineage(s, dir)
        vl.cand
          .join(vl.inter, Seq("a", "b"), "left")
          .join(vl.sig.select(col("doc_id").as("a"), col("sz").as("sa")), "a")
          .join(vl.sig.select(col("doc_id").as("b"), col("sz").as("sb")), "b")
          .withColumn("jac_bp", expr(
            "(10000 * coalesce(inter, 0L)) div (sa + sb - coalesce(inter, 0L))"))
          .select(explode(typedlit(Seq(3000L, 5000L, 7000L, 9000L))).as("thr_bp"),
            col("b"), col("jac_bp"))
          .groupBy("thr_bp")
          .agg(
            sum(when(col("jac_bp") >= col("thr_bp"), 1L).otherwise(0L)).as("n_pairs"),
            countDistinct(when(col("jac_bp") >= col("thr_bp"), col("b"))).as("n_removed"))
          .orderBy("thr_bp")
      },
      Some(s"""WITH $duckMinhashCtes,
              |ver AS (
              |  SELECT c.a, c.b,
              |         (10000 * len(list_intersect(x.shingles, y.shingles)))
              |           // len(list_distinct(list_concat(x.shingles, y.shingles))) AS jac_bp
              |  FROM cand c
              |  JOIN sh x ON x.doc_id = c.a
              |  JOIN sh y ON y.doc_id = c.b)
              |SELECT CAST(thr_bp AS BIGINT) AS thr_bp,
              |       CAST(sum(CASE WHEN jac_bp >= thr_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
              |       CAST(count(DISTINCT CASE WHEN jac_bp >= thr_bp THEN b END) AS BIGINT) AS n_removed
              |FROM ver, (VALUES (3000), (5000), (7000), (9000)) t(thr_bp)
              |GROUP BY thr_bp ORDER BY thr_bp""".stripMargin)
    ),

    // E1c SimHash: 32-bit fingerprint from per-word 60-bit hashes — bit b of
    // the fingerprint is set iff the +1/-1 vote of all distinct words' bit b
    // is positive. Relational form: distinct (doc, word) rows → one md5 per
    // word → 32 conditional sums in ONE codegen'd hash aggregate (the
    // array-lambda form re-hashed every word 32×, once per bit, after
    // Catalyst inlined the hash array into the per-bit fold). Fingerprints
    // feed the hamming-distance pair query below.
    GraftQuery(
      "q_dedup_simhash",
      "32-bit SimHash fingerprint per document",
      (s, dir) => simhashDf(s, dir).orderBy("doc_id"),
      Some(duckSimhashSql + "\nORDER BY doc_id")
    ),

    // E1c2 SimHash near-dup pairs, multi-pass rotated blocking: pass p
    // rotates the 32-bit fingerprint left by Rotations(p) bits and blocks on
    // the resulting top 16 (the standard simhash-dedup trick — near-identical
    // docs agree on most bits, so SOME rotation puts their agreeing bits in
    // the block). Pass 0 is the identity rotation, so coverage is a strict
    // superset of the old single-pass query (VERDICT r3 next-step #6: a pair
    // whose flipped bits land in the high 16 is invisible to one pass but
    // caught by a rotation that moves those bits out of the block). Pairs
    // colliding in several passes are deduped before output. At 100 TB: one
    // shuffle on (pass, block) — 3× the single-pass volume, still linear —
    // pairwise work bounded per block by the MaxBucket cap per pass.
    GraftQuery(
      "q_simhash_pairs",
      "simhash near-dup pairs: 3 rotated top-16 block passes, hamming distance <= 6",
      (s, dir) => simhashPairsFrame(s, dir).orderBy("a", "b"),
      Some(s"""WITH $duckSimhashPairsCtes
              |SELECT a, b, dist FROM spairs ORDER BY a, b""".stripMargin)
    ),

    // E1c3 fuzzy (edit-distance) near-dup pairs — the capability the
    // reference PINS but never uses (rapidfuzz, requirements.txt:2; SURVEY
    // §5.1): blocked on (source, length bucket) so the O(k²) per-pair
    // levenshtein only runs inside small blocks, and capped to 40-char
    // canonical prefixes so the per-pair cost is constant. Blocks carry the
    // same MaxBucket guard as the minhash/simhash stages — a popular source
    // with millions of same-length-bucket docs would otherwise go |block|²
    // on the most expensive per-pair primitive in the family (VERDICT r3
    // What's-wrong #1). The corpus is ASCII, where Spark's codepoint-based
    // and DuckDB's byte-based edit distances agree exactly.
    GraftQuery(
      "q_fuzzy_pairs",
      "blocked fuzzy near-dup pairs: levenshtein <= 10 on 40-char prefixes, capped blocks",
      (s, dir) => {
        val d = Tables.documents(s, dir).select(
          col("doc_id"), col("source"),
          expr("n_chars div 100").as("lb"),
          substring(coalesce(col("text"), lit("")), 1, 40).as("k"))
          .withColumn("bn", count(lit(1)).over(
            Window.partitionBy(col("source"), col("lb"))))
          .filter(col("bn") <= MaxBucket)
        val l = d.select(col("source"), col("lb"), col("doc_id").as("a"), col("k").as("ka"))
        val r = d.select(col("source"), col("lb"), col("doc_id").as("b"), col("k").as("kb"))
        l.join(r, Seq("source", "lb"))
          .filter(col("a") < col("b"))
          .withColumn("dist", levenshtein(col("ka"), col("kb")).cast("long"))
          .filter(col("dist") <= 10)
          .select("a", "b", "dist")
          .orderBy("a", "b")
      },
      Some(s"""SELECT a, b, dist FROM (
             |  SELECT l.doc_id AS a, r.doc_id AS b,
             |         CAST(levenshtein(l.k, r.k) AS BIGINT) AS dist
             |  FROM (SELECT * FROM (
             |          SELECT doc_id, source, n_chars // 100 AS lb,
             |                 substr(coalesce(text, ''), 1, 40) AS k,
             |                 count(*) OVER (PARTITION BY source, n_chars // 100) AS bn
             |          FROM documents) lb WHERE bn <= $MaxBucket) l
             |  JOIN (SELECT * FROM (
             |          SELECT doc_id, source, n_chars // 100 AS lb,
             |                 substr(coalesce(text, ''), 1, 40) AS k,
             |                 count(*) OVER (PARTITION BY source, n_chars // 100) AS bn
             |          FROM documents) rb WHERE bn <= $MaxBucket) r
             |    ON l.source = r.source AND l.lb = r.lb AND l.doc_id < r.doc_id) p
             |WHERE dist <= 10 ORDER BY a, b""".stripMargin)
    ),

    // E1d n-gram Jaccard near-dup as a SET-SIMILARITY JOIN: explode 2-gram
    // rows, equi-join on (source, gram) so candidate pairs only materialize
    // when they actually share a gram, count shared grams per pair, and
    // derive |A∪B| = |A| + |B| − |A∩B| from per-doc gram counts. Everything
    // is codegen'd row ops + hash aggregates — no array intersections, no
    // |bucket|² pair enumeration (the r2 array form recomputed both gram
    // pipelines per candidate pair after Catalyst inlined them into the join
    // filter). Stop-gram guard (VERDICT r3 What's-wrong #2): a gram like
    // "of the" appears in nearly every English doc, so its (source, gram)
    // join key would carry O(corpus) rows on both sides — one skewed shuffle
    // key plus near-quadratic pair expansion. Grams whose doc-frequency
    // within a source exceeds MaxBucket are dropped BEFORE sizes and the
    // join (the standard stop-gram/prefix filter), so the graded semantics
    // are "jaccard over non-stop grams": both the intersection and the
    // per-doc set sizes count surviving grams only, identically in both
    // engines. Hot-key group size — and therefore per-key pair fan-out — is
    // now bounded by a constant.
    GraftQuery(
      "q_ngram_jaccard",
      "2-gram Jaccard >= 0.2 pairs within each source bucket, stop-grams dropped",
      (s, dir) =>
        gramPairSizes(s, dir, phased = false)
          .withColumn("jac", round(col("inter").cast("double") /
            (col("sa") + col("sb") - col("inter")), 4))
          .filter(col("jac") >= 0.2)
          .select(col("a"), col("b"), col("jac"))
          .orderBy("a", "b"),
      Some(s"""WITH $duckGramPairCtes
              |SELECT a, b, jac FROM (
              |  SELECT p.a, p.b,
              |         round(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 4) AS jac
              |  FROM pairs p
              |  JOIN sz sa ON sa.doc_id = p.a
              |  JOIN sz sb ON sb.doc_id = p.b) t
              |WHERE jac >= 0.2 ORDER BY a, b""".stripMargin)
    ),

    // E1d2 asymmetric CONTAINMENT pairs: c(A,B) = |A∩B| / min(|A|,|B|) over
    // the same capped non-stop 2-gram sets as q_ngram_jaccard. Containment is
    // the doc-inside-doc detector Jaccard structurally misses: a short doc
    // fully quoted inside a long one has jac ≈ |A|/|B| (tiny) but cont = 1.0
    // — the RefinedWeb/CCNet-style measure for near-inclusion. Same
    // distributed shape as the jaccard join (one (source, gram) aggregate,
    // bucket-capped pair expansion, per-doc sizes from re-exploding the tiny
    // capped bucket table), so every 100 TB argument made there carries over
    // verbatim; emitting jac alongside cont makes the asymmetry visible
    // (high-cont/low-jac rows are exactly the inclusion cases).
    GraftQuery(
      "q_containment_pairs",
      "2-gram containment >= 0.3 pairs (inter / min set size) with jaccard",
      (s, dir) =>
        gramPairSizes(s, dir, phased = true)
          .withColumn("cont", round(col("inter").cast("double") /
            least(col("sa"), col("sb")), 4))
          .filter(col("cont") >= 0.3)
          .withColumn("jac", round(col("inter").cast("double") /
            (col("sa") + col("sb") - col("inter")), 4))
          .select(col("a"), col("b"), col("cont"), col("jac"))
          .orderBy("a", "b"),
      Some(s"""WITH $duckGramPairCtes
              |SELECT a, b, cont, jac FROM (
              |  SELECT p.a, p.b,
              |         round(CAST(p.inter AS DOUBLE) / least(sa.sz, sb.sz), 4) AS cont,
              |         round(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 4) AS jac
              |  FROM pairs p
              |  JOIN sz sa ON sa.doc_id = p.a
              |  JOIN sz sb ON sb.doc_id = p.b) t
              |WHERE cont >= 0.3 ORDER BY a, b""".stripMargin)
    ),

    // E1e embedding-cosine near-dup: integer-quantized vectors, pairs WITHIN a
    // label bucket (the coarse-quantizer/IVF blocking analog), exact integer
    // dot products → bit-identical cosines in both engines.
    GraftQuery(
      "q_dedup_embedding",
      "cosine >= 0.3 near-dup pairs within each label bucket (quantized)",
      (s, dir) => {
        import graft.expressions.DotProductLong.dotLong
        // dim guard like every E2/E1e2 sibling: without it a mixed-dimension
        // corpus silently drops cross-dim pairs on the Spark side (dotLong
        // NULLs on length mismatch) while the oracle's list_dot_product
        // ERRORS on unequal lists — a parity gap the shipped uniform-64
        // testdata never triggers
        val q = Tables.embeddings(s, dir)
          .filter(size(col("embedding")) === SimilarityQueries.Dim)
          .withColumn("q", expr(quantSql))
          .withColumn("n2", dotLong(col("q"), col("q")))
          .filter(col("n2") > 0)
          .select("vec_id", "label", "q", "n2")
        val l = q.select(col("label"), col("vec_id").as("a"), col("q").as("qa"), col("n2").as("na"))
        val r = q.select(col("label"), col("vec_id").as("b"), col("q").as("qb"), col("n2").as("nb"))
        l.join(r, "label")
          .filter(col("a") < col("b"))
          .withColumn("cos", dotLong(col("qa"), col("qb")).cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .filter(col("cos") >= 0.3)
          .select(col("a"), col("b"), round(col("cos"), 4).as("cos_r"))
          .orderBy("a", "b")
      },
      Some(s"""WITH q AS (
              |  SELECT vec_id, label, $duckQuantSql AS q
              |  FROM embeddings WHERE len(embedding) = ${SimilarityQueries.Dim}),
              |n AS (
              |  SELECT vec_id, label, q,
              |         list_dot_product(q::DOUBLE[], q::DOUBLE[]) AS n2
              |  FROM q WHERE list_dot_product(q::DOUBLE[], q::DOUBLE[]) > 0)
              |SELECT a, b, round(cos, 4) AS cos_r FROM (
              |  SELECT l.vec_id AS a, r.vec_id AS b,
              |         list_dot_product(l.q::DOUBLE[], r.q::DOUBLE[]) / (sqrt(l.n2) * sqrt(r.n2)) AS cos
              |  FROM n l JOIN n r ON l.label = r.label AND l.vec_id < r.vec_id) p
              |WHERE cos >= 0.3 ORDER BY a, b""".stripMargin)
    ),

    // E1e2 LSH-blocked embedding near-dup — the 100 TB path beside E1e's
    // exact-within-label form: the label vocabulary is FIXED, so label
    // buckets grow linearly with the corpus and the in-label pair stage is
    // O((N/|labels|)²); at scale, pair generation must block on hashed
    // buckets whose COUNT scales with the data. Candidates are pairs sharing
    // any (table, sign-bit bucket) within a label (the q_ann_lsh 4×4
    // OR-amplified scheme, buckets capped at MaxBucket), then verified by
    // exact integer cosine — the same candidate→verify composition as
    // q_minhash_verified. Sign-agreement for a true near-dup (cos ≈ 0.9) is
    // ~0.95 across the 4-table OR; weakly-similar pairs near the 0.3
    // threshold are where the recall price is paid, by design.
    GraftQuery(
      "q_embedding_lsh_pairs",
      "LSH-blocked embedding near-dup pairs within label, exact cosine >= 0.3 verify",
      (s, dir) => {
        import graft.expressions.DotProductLong.dotLong
        val q = Tables.embeddings(s, dir)
          .filter(size(col("embedding")) === SimilarityQueries.Dim)
          .withColumn("q", expr(quantSql))
          .withColumn("n2", dotLong(col("q"), col("q")))
          .filter(col("n2") > 0)
          .select("vec_id", "label", "q", "n2")
        // single-evaluation bucket expansion (the minhashCandidates shape):
        // the 16-hyperplane bucketsCol pipeline runs once, not once per
        // self-join branch; group size ≤ MaxBucket bounds the collect
        val cand = q.withColumn("bs", SimilarityQueries.bucketsCol)
          .select(col("vec_id"), col("label"), posexplode(col("bs")).as(Seq("t", "bucket")))
          .groupBy("label", "t", "bucket")
          .agg(array_sort(collect_set(col("vec_id"))).as("ids"))
          .filter(size(col("ids")).between(2, MaxBucket))
          .select(explode(expr(pairExpansionSql("ids")(
            (x, y) => s"named_struct('a', $x, 'b', $y)"))).as("p"))
          .select(col("p.a").as("a"), col("p.b").as("b"))
          .distinct()
        cand
          .join(q.select(col("vec_id").as("a"), col("q").as("qa"), col("n2").as("na")), "a")
          .join(q.select(col("vec_id").as("b"), col("q").as("qb"), col("n2").as("nb")), "b")
          .withColumn("cos", dotLong(col("qa"), col("qb")).cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .filter(col("cos") >= 0.3)
          .select(col("a"), col("b"), round(col("cos"), 4).as("cos_r"))
          .orderBy("a", "b")
      },
      Some(s"""WITH n AS (
              |  SELECT vec_id, label, q, list_dot_product(q::DOUBLE[], q::DOUBLE[]) AS n2
              |  FROM (SELECT vec_id, label, $duckQuantSql AS q
              |        FROM embeddings WHERE len(embedding) = ${SimilarityQueries.Dim}) t0
              |  WHERE list_dot_product(q::DOUBLE[], q::DOUBLE[]) > 0),
              |b AS (SELECT vec_id, label, ${SimilarityQueries.duckBucketsSql} AS bs FROM n),
              |e0 AS (SELECT vec_id, label, ti.t AS t, bs[ti.t + 1] AS bucket
              |       FROM b, (SELECT unnest(range(0, ${SimilarityQueries.NTables})) AS t) ti),
              |e AS (SELECT vec_id, label, t, bucket FROM (
              |        SELECT vec_id, label, t, bucket,
              |               count(*) OVER (PARTITION BY label, t, bucket) AS bn
              |        FROM e0) c WHERE bn <= $MaxBucket),
              |cand AS (
              |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
              |  FROM e l JOIN e r ON l.label = r.label AND l.t = r.t
              |                   AND l.bucket = r.bucket AND l.vec_id < r.vec_id)
              |SELECT a, b, round(cos, 4) AS cos_r FROM (
              |  SELECT c.a, c.b,
              |         list_dot_product(x.q::DOUBLE[], y.q::DOUBLE[]) / (sqrt(x.n2) * sqrt(y.n2)) AS cos
              |  FROM cand c JOIN n x ON x.vec_id = c.a JOIN n y ON y.vec_id = c.b) p
              |WHERE cos >= 0.3 ORDER BY a, b""".stripMargin)
    ),

    // E1f benchmark decontamination: flag training documents whose distinct
    // 3-gram overlap with a held-out benchmark set (source 'src0' stands in)
    // reaches 50% — the screening pass every training pipeline runs so eval
    // data doesn't leak into the corpus. Shares the shingle pipeline with
    // the minhash family. Scale shape: the benchmark gram set is the small
    // side of a semi-join (broadcast on a cluster); the corpus side is one
    // scan + two keyed aggregates — never pairwise.
    GraftQuery(
      "q_decontaminate",
      "flag docs with >= 50% 3-gram overlap against the src0 benchmark set",
      (s, dir) => {
        // the (shingle, source) lineage feeds three aggregates (bench set,
        // totals, shared counts) — persist or each re-runs the explode +
        // lead-window pipeline (same materialize-once rule as
        // q_minhash_verified; honest per-query bench timing made the 3×
        // re-evaluation visible). source is CARRIED through the row-local
        // shingle pipeline, not re-joined from documents afterwards
        val sh = shingleRows(Tables.spread(Tables.documents(s, dir)), Seq("source"))
          .drop("h").persist()
        val bench = sh.filter(col("source") === "src0").select("shingle").distinct()
        val cand  = sh.filter(col("source") =!= "src0")
        val total = cand.groupBy("doc_id").agg(count(lit(1)).as("total"))
        val shared = cand.join(bench, Seq("shingle"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("shared"))
        // overlap as integer basis points via floor division — float
        // division + round() has engine-divergent ties at the half-way
        // decimal; integer math is exact in both engines by construction
        total.join(shared, Seq("doc_id"), "left")
          .withColumn("shared", coalesce(col("shared"), lit(0L)))
          .withColumn("ratio_bp", expr("(shared * 10000) div total"))
          .filter(col("ratio_bp") >= 5000)
          .select("doc_id", "shared", "total", "ratio_bp")
          .orderBy("doc_id")
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, source, $duckWordsSql AS words FROM documents),
              |sh AS (
              |  SELECT doc_id, source,
              |         unnest(list_distinct($duckShinglesSql)) AS shingle
              |  FROM docs WHERE len(words) >= 3),
              |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
              |cand AS (SELECT doc_id, shingle FROM sh WHERE source <> 'src0'),
              |tot AS (SELECT doc_id, count(*) AS total FROM cand GROUP BY doc_id),
              |shr AS (SELECT c.doc_id, count(*) AS shared
              |        FROM cand c JOIN bench b USING (shingle) GROUP BY c.doc_id)
              |SELECT doc_id, shared, total, ratio_bp FROM (
              |  SELECT t.doc_id, coalesce(s.shared, 0) AS shared, t.total,
              |         (coalesce(s.shared, 0) * 10000) // t.total AS ratio_bp
              |  FROM tot t LEFT JOIN shr s USING (doc_id)) f
              |WHERE ratio_bp >= 5000 ORDER BY doc_id""".stripMargin)
    ),

    // E1f2 SPAN-level decontamination (VERDICT r5 next-step #7): not just
    // WHETHER a training doc overlaps the benchmark but WHICH contiguous
    // token spans do — the form an eval-leak audit actually wants (and the
    // input to span-masking instead of whole-doc dropping). Positional
    // 3-gram shingles of candidate docs are semi-joined against the src0
    // benchmark set, then matched positions merge into islands: two matched
    // shingles join one span iff their token coverages touch (gap <= 3
    // positions). span_end = last matched position + 2 (the shingle's last
    // covered token).
    //
    // Scale shape: the benchmark set is the small broadcast side of the
    // semi-join (same as q_decontaminate); the island merge is two
    // doc_id-partitioned window passes over MATCHED rows only (a small
    // fraction of the corpus) sharing one sort. Never pairwise.
    GraftQuery(
      "q_span_decontaminate",
      "contiguous token spans of candidate docs overlapping the src0 benchmark 3-grams",
      (s, dir) => {
        val ps = positionalShingles(Tables.spread(Tables.documents(s, dir)), Seq("source")).persist()
        val bench = ps.filter(col("source") === "src0").select("shingle").distinct()
        val matched = ps.filter(col("source") =!= "src0")
          .join(bench, Seq("shingle"), "left_semi")
          .select(col("doc_id"), col("pos"))
        spanIslands(matched)
          .groupBy("doc_id", "g")
          .agg(min(col("pos")).cast("bigint").as("span_start"),
            (max(col("pos")) + 2).cast("bigint").as("span_end"),
            count(lit(1)).as("n_grams"))
          .select(col("doc_id"), col("span_start"), col("span_end"),
            (col("span_end") - col("span_start") + 1).as("span_tokens"), col("n_grams"))
          .orderBy("doc_id", "span_start")
      },
      Some(s"""WITH $duckPositionalShingleCtes,
              |bench AS (SELECT DISTINCT shingle FROM ps WHERE source = 'src0'),
              |m AS (SELECT doc_id, pos FROM ps WHERE source <> 'src0'
              |      AND shingle IN (SELECT shingle FROM bench)),
              |$duckIslandCtes
              |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
              |       CAST(max(pos) + 2 AS BIGINT) AS span_end,
              |       CAST(max(pos) - min(pos) + 3 AS BIGINT) AS span_tokens,
              |       count(*) AS n_grams
              |FROM grp GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin)
    ),

    // E1f3 BLOOM-prefiltered decontamination: the 100 TB form of the
    // benchmark-overlap check when the benchmark gram set itself is too
    // large to broadcast exactly — a BloomBits-bit k-hash Bloom filter of
    // the bench shingles is the CONSTANT-memory broadcast side; candidate
    // shingles failing any bit are provably clean (no false negatives) and
    // only the survivors reach the exact membership verify. Graded output
    // reports the measured false-positive rate per source beside the exact
    // hits, so the filter's sizing error is visible the same way the CMS
    // collision error is (E3q).
    //
    // Scale shape: the filter is materialized as an actual BITSET —
    // BloomBits/64 longs collected once from the bench side (a
    // constant-bounded driver sync, the codebook class) and shipped as a
    // plan literal, exactly the broadcast-Bloom-prefilter construction of
    // guide §3.2 — so the candidate-side probe is k row-local bit tests
    // per shingle occurrence with ZERO additional shuffle. The previous
    // rendering kept the bits as a set-of-set-bits TABLE and derived the
    // verdict through explode(k probes) → broadcast join → groupBy(shingle)
    // → join-back: three corpus-sized exchanges to evaluate a function of
    // the shingle alone. The expensive exact join still touches only bloom
    // survivors ≈ true hits + FP. BloomBits is sized to the TEST corpus
    // (~3k bench shingles) so the FP branch actually fires; a deployment
    // sizes m/k to its bench set (m ≈ 1.44·k·n bits per the standard
    // formula) and ships the same bitset via sc.broadcast when m outgrows
    // a comfortable literal.
    GraftQuery(
      "q_bloom_decontaminate",
      "bloom-prefiltered benchmark overlap with measured FP rate per source",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // persisted: the bench/bits, candidate, and totals branches all
        // read this lineage (family cache discipline, see line 32)
        // the signature-family hash column is dead weight here — drop it
        // before the cache materializes one md5 per shingle row for nothing;
        // source rides the carry instead of a corpus-sized re-join
        val sh = shingleRows(Tables.spread(docs), Seq("source")).drop("h").persist()
        val bench = sh.filter(col("source") === "src0").select("shingle").distinct()
        // build the filter: collect the bench side's set bit positions
        // (≤ BloomBits rows — constant-bounded, the codebook-sync class)
        // into an actual bitset shipped as one array<bigint> literal
        val posRows = bench.select(explode(bloomPosCols).as("pos")).distinct()
          .collect().map(_.getLong(0))
        val bitWords = new Array[Long]((BloomBits.toInt + 63) / 64)
        posRows.foreach(p => bitWords(p.toInt >> 6) |= (1L << (p & 63L)))
        val cand = sh.filter(col("source") =!= "src0")
          .select("doc_id", "source", "shingle")
        // bloom membership is k row-local bit tests against the literal
        // bitset — no explode, no join, no shuffle on the candidate side
        // (guide §3.2's manual Bloom prefilter, minus its UDF: the probe
        // stays a codegen'd expression)
        val bmp = typedlit(bitWords.toSeq)
        val testsSql = (0 until BloomK).map { j =>
          // the duplicated `pos` subtree is evaluated once per row by
          // codegen subexpression elimination
          val pos = s"(${hash60Sql(s"concat('bloom$j:', shingle)")}) % $BloomBits"
          s"(shiftright(element_at(bmp, cast(($pos) div 64 as int) + 1), " +
            s"cast(($pos) % 64 as int)) & 1)"
        }.mkString(" & ")
        val flags = cand.withColumn("bmp", bmp)
          .withColumn("maybe", expr(s"cast($testsSql as bigint)"))
          .drop("bmp")
        // exact verify: un-hinted — the premise of this query is that bench
        // may be too big to broadcast (the bloom side is the constant-memory
        // broadcast); survivors are few, so at scale this is a small keyed
        // shuffle join, and AQE still broadcasts bench when it happens to fit
        val verified = flags.filter(col("maybe") === 1L)
          .join(bench.withColumn("ex", lit(1L)), Seq("shingle"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("bloom_pass"),
            sum(coalesce(col("ex"), lit(0L))).as("exact_hits"))
        cand.groupBy("source").agg(count(lit(1)).as("n_shingles"))
          .join(verified, Seq("source"), "left")
          .select(col("source"), col("n_shingles"),
            coalesce(col("bloom_pass"), lit(0L)).as("bloom_pass"),
            coalesce(col("exact_hits"), lit(0L)).as("exact_hits"))
          .withColumn("false_pos", expr("bloom_pass - exact_hits"))
          .withColumn("fp_bp",
            expr("(false_pos * 10000) div greatest(1L, n_shingles - exact_hits)"))
          .orderBy("source")
      },
      Some {
        val duckPos = (0 until BloomK).map(j =>
          s"(${duckHash60(s"'bloom$j:' || shingle")}) % $BloomBits").mkString("[", ", ", "]")
        s"""WITH docs AS (SELECT doc_id, source, $duckWordsSql AS words FROM documents),
           |sh AS (SELECT doc_id, source, unnest(list_distinct($duckShinglesSql)) AS shingle
           |       FROM docs WHERE len(words) >= 3),
           |bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
           |bits AS (SELECT DISTINCT pos FROM (
           |           SELECT unnest($duckPos) AS pos FROM bench) b),
           |cand AS (SELECT doc_id, source, shingle FROM sh WHERE source <> 'src0'),
           |cpos AS (SELECT doc_id, source, shingle, unnest($duckPos) AS pos FROM cand),
           |flags AS (SELECT doc_id, source, shingle,
           |                 min(CASE WHEN pos IN (SELECT pos FROM bits)
           |                          THEN 1 ELSE 0 END) AS maybe
           |          FROM cpos GROUP BY doc_id, source, shingle),
           |ver AS (SELECT source, count(*) AS bloom_pass,
           |               CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM bench)
           |                             THEN 1 ELSE 0 END) AS BIGINT) AS exact_hits
           |        FROM flags WHERE maybe = 1 GROUP BY source),
           |tot AS (SELECT source, count(*) AS n_shingles FROM cand GROUP BY source)
           |SELECT t.source, t.n_shingles,
           |       coalesce(v.bloom_pass, 0) AS bloom_pass,
           |       coalesce(v.exact_hits, 0) AS exact_hits,
           |       coalesce(v.bloom_pass, 0) - coalesce(v.exact_hits, 0) AS false_pos,
           |       ((coalesce(v.bloom_pass, 0) - coalesce(v.exact_hits, 0)) * 10000)
           |         // greatest(1, t.n_shingles - coalesce(v.exact_hits, 0)) AS fp_bp
           |FROM tot t LEFT JOIN ver v USING (source) ORDER BY source""".stripMargin
      }
    ),

    // E1i dedup provenance matrix: near-dup pair counts by (source, source)
    // — the report a curation run reads to see WHERE duplication comes from
    // (one boilerplate-heavy source, or systematic cross-source mirroring).
    // Shares the minhash candidate lineage; the source lookup is two keyed
    // joins against the (doc_id, source) projection; the pair is
    // canonicalized (least, greatest) so the matrix is upper-triangular.
    GraftQuery(
      "q_dup_sources",
      "near-dup candidate pair counts by canonical source pair",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val src  = docs.select(col("doc_id"), col("source"))
        minhashCandidates(Tables.spread(docs))
          .join(src.select(col("doc_id").as("a"), col("source").as("sa")), "a")
          .join(src.select(col("doc_id").as("b"), col("source").as("sb")), "b")
          .select(least(col("sa"), col("sb")).as("s1"),
            greatest(col("sa"), col("sb")).as("s2"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("pairs"))
          .orderBy("s1", "s2")
      },
      Some(s"""WITH $duckMinhashCtes
              |SELECT s1, s2, count(*) AS pairs FROM (
              |  SELECT least(da.source, db.source) AS s1,
              |         greatest(da.source, db.source) AS s2
              |  FROM cand
              |  JOIN documents da ON da.doc_id = cand.a
              |  JOIN documents db ON db.doc_id = cand.b) j
              |GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin)
    ),

    // E1g dedup-cluster canonicalization: near-dup PAIRS are not what a
    // pipeline keeps — it keeps one canonical doc per connected component of
    // the pair graph (a~b, b~c ⇒ {a,b,c} even though a,c never collided).
    // The graph machinery lives in [[graft.operators.Components]]; this query
    // feeds it the minhash candidate edges. The graded path uses the O(log n)
    // alternating large-star/small-star form (VERDICT r5 what's-wrong #2):
    // dedup clusters are near-cliques TODAY, but a pathological similarity
    // chain makes the diameter-bound propagation rounds = diameter, and the
    // alternating form costs the same per round while capping rounds at
    // O(log n) on any graph shape. The edge set is the [[bucketStarEdges]]
    // seeding form (VERDICT r6 next-step #1) — per-bucket min-label stars,
    // connectivity-identical to the capped clique pairs the oracle closes
    // over (buckets survive whole or not at all) at O(size) edges per
    // bucket, so the contraction starts from an almost-converged graph.
    GraftQuery(
      "q_dup_clusters",
      "connected-component canonical doc per minhash near-dup cluster",
      (s, dir) =>
        // Tables.spread: the per-shingle md5 + minhash fold is the hot
        // stage; on the single-split local files it would otherwise run on
        // one core (no-op on real multi-split inputs — r8 profile).
        // phased = true: this is the PhasedQueries member, so only THIS
        // call site self-attributes cc_seed/cc_rounds under a capture
        // (q_cluster_split shares the operator and must stay silent).
        graft.operators.Components.connectedAlternating(
          Tables.documents(s, dir).select("doc_id"),
          bucketStarEdges(arraySignatures(Tables.spread(Tables.documents(s, dir)))),
          phased = true)
          .select(col("id").as("doc_id"), col("lbl").as("canon"))
          .orderBy("doc_id"),
      // Independent oracle algorithm: transitive closure by recursive CTE —
      // a label L reaches doc x iff they share a component, so min(L) per x
      // is the component minimum (same fixpoint, different computation).
      Some(s"""WITH RECURSIVE $duckMinhashCtes,
              |sym AS (SELECT a, b FROM cand UNION ALL SELECT b AS a, a AS b FROM cand),
              |comp(id, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT s.b, c.lbl FROM comp c JOIN sym s ON s.a = c.id)
              |SELECT id AS doc_id, min(lbl) AS canon
              |FROM comp GROUP BY id ORDER BY doc_id""".stripMargin)
    ),

    // E1x cluster-aware train/val/test split — the LEAKAGE GUARD every
    // serious LLM data pipeline needs and naive per-doc hash splits get
    // wrong: if two near-duplicate documents land in train and test, the
    // eval is contaminated by construction. The fix is to split by the
    // near-dup CLUSTER: every doc hashes on its component root (the
    // q_dup_clusters canon), so a whole cluster moves as one unit and no
    // cluster can span splits — the guarantee is structural, not audited
    // after the fact. Split rule: hash60(canon) % 100 → train < 80, val
    // 80-89, test ≥ 90 (deterministic, replayable, engine-agnostic — the
    // q_hash_sample discipline applied to the cluster key).
    //
    // Scale shape: the component pass is q_dup_clusters' (bucket-star
    // seeded contraction, capped edges); the split itself is a row-local
    // hash on the canon column; the report is one 3-row groupBy plus a
    // broadcast 1-row total for the shares. Nothing new shuffles.
    GraftQuery(
      "q_cluster_split",
      "leakage-safe split: docs assigned train/val/test by hash of their dup-cluster root",
      (s, dir) => {
        val canon = graft.operators.Components.connectedAlternating(
          Tables.documents(s, dir).select("doc_id"),
          bucketStarEdges(arraySignatures(Tables.spread(Tables.documents(s, dir)))))
          .select(col("id").as("doc_id"), col("lbl").as("canon"))
        val tagged = canon.withColumn("split",
          expr(s"case when ${hash60Sql("cast(canon as string)")} % 100 < 80 then 'train' " +
            s"when ${hash60Sql("cast(canon as string)")} % 100 < 90 then 'val' " +
            "else 'test' end"))
        val total = tagged.agg(count(lit(1)).as("total_docs"))
        tagged.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("canon")).as("n_clusters"))
          .crossJoin(broadcast(total))
          .withColumn("doc_share_bp", expr("(n_docs * 10000) div total_docs"))
          .select("split", "n_docs", "n_clusters", "doc_share_bp")
          .orderBy("split")
      },
      Some(s"""WITH RECURSIVE $duckMinhashCtes,
              |sym AS (SELECT a, b FROM cand UNION ALL SELECT b AS a, a AS b FROM cand),
              |comp(id, lbl) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT s.b, c.lbl FROM comp c JOIN sym s ON s.a = c.id),
              |canon AS (SELECT id AS doc_id, min(lbl) AS canon FROM comp GROUP BY id),
              |tagged AS (
              |  SELECT doc_id, canon,
              |         CASE WHEN ${duckHash60("CAST(canon AS VARCHAR)")} % 100 < 80 THEN 'train'
              |              WHEN ${duckHash60("CAST(canon AS VARCHAR)")} % 100 < 90 THEN 'val'
              |              ELSE 'test' END AS split
              |  FROM canon),
              |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM tagged)
              |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
              |       CAST(count(DISTINCT canon) AS BIGINT) AS n_clusters,
              |       (CAST(count(*) AS BIGINT) * 10000) // tot.total_docs AS doc_share_bp
              |FROM tagged, tot
              |GROUP BY split, tot.total_docs ORDER BY split""".stripMargin)
    ),

    // E1j cross-doc duplicated-span coverage: per source, the fraction of
    // token positions sitting inside a 3-gram that also occurs in at least
    // one OTHER document — substring-level exact dedup (the Lee et al.
    // "Deduplicating Training Data" audit) at shingle granularity, and the
    // intra-corpus twin of q_span_decontaminate (that query asks "which
    // spans leak from the benchmark", this one "how much of each source is
    // boilerplate shared across docs").
    //
    // Scale shape: positional shingles → one corpus-cardinality (shingle →
    // distinct-doc count) hash aggregate → semi-join matched positions →
    // the same two doc_id-partitioned window passes as the span merge →
    // two keyed aggregates. No pairwise stage anywhere: a shingle shared
    // by a million docs costs one histogram row, not 10^12 pairs.
    GraftQuery(
      "q_dup_span_coverage",
      "per-source token coverage (bp) of 3-gram spans duplicated across docs",
      (s, dir) => {
        val ps = positionalShingles(Tables.spread(Tables.documents(s, dir)), Nil).persist()
        // Phase attribution (VERDICT r14 next-step #5), capture-gated: the
        // bench's diagnostic evaluation splits the positional-shingle build
        // (`shingle_pos` — materializes the persisted frame the later
        // stages share), the duplicated-shingle df aggregate (`dup_df`,
        // over that cache), and the island-merge window+aggregate pipeline
        // (`island_agg`); the residual is the final per-source rollup.
        // Outside a capture every branch is identity — the lazy graded
        // plan, and the Verify/oracle path, are byte-identical.
        val capturing = graft.Phases.capturing
        if (capturing) graft.Phases.timed("shingle_pos") { ps.count(); () }
        val dup = ps.groupBy("shingle")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= 2)
          .select("shingle")
        if (capturing) graft.Phases.timed("dup_df") { dup.count(); () }
        // matched positions merge into islands exactly as in
        // q_span_decontaminate (shared spanIslands helper), so each island
        // covers max - min + 3 tokens with no double count
        val covered = spanIslands(
          ps.join(dup, Seq("shingle"), "left_semi").select(col("doc_id"), col("pos")))
          .groupBy("doc_id", "g")
          .agg((max(col("pos")) - min(col("pos")) + 3).as("span_tokens"))
          .groupBy("doc_id")
          .agg(sum(col("span_tokens")).as("cov"))
        if (capturing) graft.Phases.timed("island_agg") { covered.count(); () }
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            expr(s"cast(size($wordsSql) as bigint)").as("toks"))
          .join(covered, Seq("doc_id"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("cov"), lit(0L))).as("dup_tokens"),
            sum(col("toks")).as("total_tokens"))
          .withColumn("coverage_bp", expr("(dup_tokens * 10000) div total_tokens"))
          .orderBy("source")
      },
      Some(s"""WITH $duckPositionalShingleCtes,
              |dup AS (SELECT shingle FROM ps
              |        GROUP BY shingle HAVING count(DISTINCT doc_id) >= 2),
              |m AS (SELECT doc_id, pos FROM ps
              |      WHERE shingle IN (SELECT shingle FROM dup)),
              |$duckIslandCtes,
              |spans AS (
              |  SELECT doc_id, CAST(max(pos) - min(pos) + 3 AS BIGINT) AS span_tokens
              |  FROM grp GROUP BY doc_id, g),
              |cov AS (SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS cov
              |        FROM spans GROUP BY doc_id),
              |tot AS (SELECT doc_id, source, CAST(len(words) AS BIGINT) AS toks FROM docs)
              |SELECT source, count(*) AS n_docs,
              |       CAST(sum(coalesce(cov, 0)) AS BIGINT) AS dup_tokens,
              |       CAST(sum(toks) AS BIGINT) AS total_tokens,
              |       (CAST(sum(coalesce(cov, 0)) AS BIGINT) * 10000)
              |         // CAST(sum(toks) AS BIGINT) AS coverage_bp
              |FROM tot LEFT JOIN cov USING (doc_id)
              |GROUP BY source ORDER BY source""".stripMargin)
    ),

    // E1k cross-source overlap matrix: pairwise Jaccard of the sources'
    // distinct-3-gram sets — the curation audit that shows WHICH sources
    // mirror each other (q_dup_sources reports where near-dup PAIRS come
    // from; this reports wholesale set overlap even when no single doc
    // pair collides).
    //
    // Scale shape: shingles build ROW-LOCALLY (slice+zip — a histogram
    // needs no doc-keyed window), the corpus collapses to the distinct
    // (source, shingle) set, and the pairwise stage runs per SHINGLE over
    // its source list — expansion bounded by #sources², never corpus² (a
    // shingle in every source costs one bounded row list). Per-source set
    // sizes are a #sources-row broadcast.
    GraftQuery(
      "q_source_overlap",
      "pairwise source 3-gram-set Jaccard overlap matrix, in basis points",
      (s, dir) => {
        // ONE groupBy(shingle) -> sorted source set is both the distinct
        // AND the overlap structure (collect_set collapses duplicate
        // (source, shingle) rows for free), so the old explicit
        // .distinct() exchange ahead of it is gone; per-source distinct
        // set sizes come back out of the cached sets by a row-local
        // explode + #sources-key count instead of a second corpus pass
        val bySh = Tables.spread(Tables.documents(s, dir))
          .withColumn("ws", expr(wordsSql))
          .filter(size(col("ws")) >= 3)
          .withColumn("a1", slice(col("ws"), lit(1), size(col("ws")) - 2))
          .withColumn("a2", slice(col("ws"), lit(2), size(col("ws")) - 2))
          .withColumn("a3", slice(col("ws"), lit(3), size(col("ws")) - 2))
          .select(col("source"), explode(arrays_zip(col("a1"), col("a2"), col("a3"))).as("p"))
          .select(col("source"),
            concat_ws(" ", col("p.a1"), col("p.a2"), col("p.a3")).as("shingle"))
          .groupBy("shingle")
          .agg(array_sort(collect_set(col("source"))).as("ss"))
          .persist()
        val sizes = bySh.select(explode(col("ss")).as("source"))
          .groupBy("source").agg(count(lit(1)).as("c"))
        val inter = bySh
          .filter(size(col("ss")) >= 2)
          .select(explode(expr(pairExpansionSql("ss")(
            (x, y) => s"named_struct('s1', $x, 's2', $y)"))).as("p"))
          .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.select(col("source").as("s1"), col("c").as("c1"))), "s1")
          .join(broadcast(sizes.select(col("source").as("s2"), col("c").as("c2"))), "s2")
          .select(col("s1"), col("s2"), col("inter"),
            expr("(inter * 10000) div (c1 + c2 - inter)").as("jaccard_bp"))
          .orderBy("s1", "s2")
      },
      Some(s"""WITH docs AS (SELECT source, $duckWordsSql AS words FROM documents),
              |sh AS (
              |  SELECT DISTINCT source,
              |         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
              |  FROM (SELECT source, words, unnest(range(1, len(words) - 1)) AS i
              |        FROM docs WHERE len(words) >= 3) t),
              |sz AS (SELECT source, count(*) AS c FROM sh GROUP BY source),
              |ix AS (SELECT a.source AS s1, b.source AS s2, count(*) AS inter
              |       FROM sh a JOIN sh b USING (shingle)
              |       WHERE a.source < b.source GROUP BY 1, 2)
              |SELECT s1, s2, inter,
              |       (inter * 10000) // (x.c + y.c - inter) AS jaccard_bp
              |FROM ix JOIN sz x ON x.source = ix.s1 JOIN sz y ON y.source = ix.s2
              |ORDER BY s1, s2""".stripMargin)
    ),

    // E1m suffix-ordered maximal duplicated span (the suffix-array exact
    // substring dedup of Lee et al. 2022, "Deduplicating Training Data
    // Makes Language Models Better", re-expressed relationally): sort every
    // token suffix (prefix-capped at SfxK tokens), compare each suffix with
    // its sorted NEIGHBORS from other documents, and report per document
    // the longest token span that appears verbatim elsewhere — arbitrary
    // span length in ONE pass, where the shingle approach (E1j) would need
    // one explode per candidate length.
    //
    // Correctness: in token-lexicographic order the other-doc suffix with
    // the longest common prefix is always reachable through adjacent pairs
    // (lcp to a non-adjacent row is the min of the adjacent lcps between
    // them), so a doc's max over its rows' lag/lead comparisons IS the true
    // max. Space-joined string order equals token order here because ' '
    // sorts below every token character — a PRECONDITION, not a theorem:
    // it holds for tokens from the whitespace split of ordinary text, but
    // a token containing a sub-0x20 control character (a literal tab
    // surviving the space-only split) breaks the prefix-order equivalence
    // and can make the adjacency argument under-report that doc's true
    // maximum (both engines agree — parity holds — the value is just
    // conservative). A corpus with control characters inside tokens should
    // normalize them out first (X9 q_text_normalize is the tool).
    // The lcp itself is branch-free:
    // first `false` position in the element-wise equality array of the two
    // min-length-trimmed prefixes.
    //
    // Scale shape: suffixes are O(total tokens) rows carrying a constant
    // SfxK-token payload; the ONE window partitions by the suffix's leading
    // 2-gram (vocab²-cardinality buckets — suffix pairs in different
    // buckets share < 2 leading tokens, so they can never reach the
    // MinSpan = 3 report threshold) and sorts only within bucket. No pair
    // expansion anywhere — the sort IS the candidate structure, which is
    // exactly why suffix arrays beat n-gram explosion at long span lengths.
    GraftQuery(
      "q_longest_dup_span",
      "per-doc longest token span duplicated verbatim in another doc (suffix-ordered)",
      (s, dir) => longestDupSpans(Tables.spread(Tables.documents(s, dir))),
      Some(s"""WITH d AS (SELECT doc_id, $duckWordsSql AS ws FROM documents),
              |sfx AS (
              |  SELECT doc_id, i AS pos, ws[i : i + ${SfxK - 1}] AS sfx
              |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i
              |        FROM d WHERE len(ws) >= $MinSpan) t),
              |s AS (
              |  SELECT doc_id, pos, sfx, sfx[1] || ' ' || sfx[2] AS b,
              |         array_to_string(sfx, ' ') AS key
              |  FROM sfx),
              |nb AS (
              |  SELECT doc_id, sfx,
              |         lag(sfx) OVER w AS p_sfx, lag(doc_id) OVER w AS p_doc,
              |         lead(sfx) OVER w AS n_sfx, lead(doc_id) OVER w AS n_doc
              |  FROM s WINDOW w AS (PARTITION BY b ORDER BY key, doc_id, pos)),
              |v AS (
              |  SELECT doc_id,
              |         greatest(${duckLcpSql("sfx", "p_sfx", "p_doc")},
              |                  ${duckLcpSql("sfx", "n_sfx", "n_doc")}) AS span
              |  FROM nb),
              |a AS (
              |  SELECT doc_id,
              |         max(CASE WHEN span >= $MinSpan THEN span ELSE 0 END) AS longest_dup
              |  FROM v GROUP BY doc_id)
              |SELECT d.doc_id, CAST(coalesce(a.longest_dup, 0) AS BIGINT) AS longest_dup
              |FROM (SELECT doc_id FROM documents) d LEFT JOIN a USING (doc_id)
              |ORDER BY doc_id""".stripMargin)
    ),

    // E1n corpus novelty curve: per document (in doc_id ingestion order),
    // how many of its distinct 3-gram shingles appear HERE FIRST — the
    // diminishing-returns profile a curation team reads before paying for
    // more of a source (novelty collapsing toward 0 = the crawl is
    // re-reading itself; the "how much new content does increment N add"
    // artifact of dataset-growth decisions). First occurrence = min doc_id
    // over the shingle's postings, the same keep-lowest-id convention as
    // q_dedup_exact / q_dedup_curve.
    //
    // Scale shape: one shingle-keyed min-aggregate (map-side combined) +
    // one shingle-keyed equi-join + one doc-keyed re-aggregate — every
    // stage linear in distinct (doc, shingle) rows, every shuffle key
    // shingle- or doc-cardinality. No pairs, no windows. Integer bp.
    GraftQuery(
      "q_novelty_curve",
      "per-doc first-seen shingle fraction (bp) in doc_id order — corpus novelty profile",
      (s, dir) => {
        val sh = shingleRows(Tables.spread(Tables.documents(s, dir))).persist()
        noveltyFrom(sh, sh.groupBy("shingle").agg(min(col("doc_id")).as("first_doc")))
      },
      Some(s"""WITH docs AS (SELECT doc_id, $duckWordsSql AS words FROM documents),
              |sh AS (
              |  SELECT doc_id, unnest(list_distinct($duckShinglesSql)) AS shingle
              |  FROM docs WHERE len(words) >= 3),
              |f AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
              |SELECT sh.doc_id, count(*) AS n_shingles,
              |       CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
              |       (CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) * 10000)
              |         // count(*) AS novelty_bp
              |FROM sh JOIN f USING (shingle)
              |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin)
    ),

    // E1o minhash estimator-error audit: for every band-collided candidate
    // pair, the 8-slot signature-agreement ESTIMATE of Jaccard graded
    // beside the exact shingle-set value — the same
    // sketch-beside-exact-so-error-is-visible move as the CMS (E3q) and
    // Bloom-FP (E1f3) audits, here sizing the question every minhash
    // deployment faces: are 8 permutations enough at my threshold, or do I
    // pay for 64? All integer basis points (est is a multiple of 1250).
    //
    // Scale shape: shares the capped candidate lineage with
    // q_minhash_verified — the signature compare is 8 integer equality
    // tests per CANDIDATE (not per pair of corpus docs), the exact side the
    // same shingle-rows-through-candidates join, then doc-keyed joins for
    // sizes. Nothing beyond the already-capped candidate set.
    GraftQuery(
      "q_minhash_error",
      "per-candidate-pair minhash estimate vs exact jaccard (bp) + absolute error",
      (s, dir) => {
        val vl = verifyLineage(s, dir)
        val sigA = vl.sig.select(col("doc_id").as("a") +:
          Salts.indices.map(i => col(s"m$i").as(s"am$i")) :+ col("sz").as("sa"): _*)
        val sigB = vl.sig.select(col("doc_id").as("b") +:
          Salts.indices.map(i => col(s"m$i").as(s"bm$i")) :+ col("sz").as("sb"): _*)
        vl.cand
          .join(vl.inter, Seq("a", "b"), "left")
          .join(sigA, "a")
          .join(sigB, "b")
          .withColumn("matches", expr(Salts.indices
            .map(i => s"if(am$i = bm$i, cast(1 as bigint), cast(0 as bigint))")
            .mkString(" + ")))
          .withColumn("est_bp", expr(s"(matches * 10000) div ${Salts.size}"))
          .withColumn("exact_bp", expr(
            "(coalesce(inter, cast(0 as bigint)) * 10000) div " +
              "(sa + sb - coalesce(inter, cast(0 as bigint)))"))
          .withColumn("abs_err_bp", expr("abs(est_bp - exact_bp)"))
          .select("a", "b", "matches", "est_bp", "exact_bp", "abs_err_bp")
          .orderBy("a", "b")
      },
      Some(s"""WITH $duckMinhashCtes
              |SELECT c.a, c.b,
              |  CAST(len(list_filter(range(1, ${Salts.size + 1}), i -> x.sig[i] = y.sig[i])) AS BIGINT) AS matches,
              |  (CAST(len(list_filter(range(1, ${Salts.size + 1}), i -> x.sig[i] = y.sig[i])) AS BIGINT) * 10000)
              |    // ${Salts.size} AS est_bp,
              |  (CAST(len(list_intersect(p.shingles, q.shingles)) AS BIGINT) * 10000)
              |    // CAST(len(list_distinct(list_concat(p.shingles, q.shingles))) AS BIGINT) AS exact_bp,
              |  abs((CAST(len(list_filter(range(1, ${Salts.size + 1}), i -> x.sig[i] = y.sig[i])) AS BIGINT) * 10000) // ${Salts.size}
              |    - (CAST(len(list_intersect(p.shingles, q.shingles)) AS BIGINT) * 10000)
              |      // CAST(len(list_distinct(list_concat(p.shingles, q.shingles))) AS BIGINT)) AS abs_err_bp
              |FROM cand c
              |JOIN sig x ON x.doc_id = c.a
              |JOIN sig y ON y.doc_id = c.b
              |JOIN sh p ON p.doc_id = c.a
              |JOIN sh q ON q.doc_id = c.b
              |ORDER BY c.a, c.b""".stripMargin)
    ),

    // E1p duplicated-span REMOVAL — the transformation half of Lee et al.'s
    // exact-substring dedup (E1j/E1m measure; this one actually CUTS): every
    // token covered by a cross-document duplicated 3-gram island is removed
    // and the document re-emitted, with the removed-token count beside it.
    // Islands merge exactly as in q_dup_span_coverage (shared spanIslands),
    // so overlapping matches never double-cut and each doc keeps its
    // unique prose with the boilerplate excised — the C4/RefinedWeb-style
    // "remove the duplicated lines, keep the document" policy at span
    // granularity.
    //
    // Scale shape: the span table is per-doc bounded (islands ≤ tokens/3)
    // and rides a doc-keyed collect_list; the cut itself is a row-local
    // array lambda over (word, index) against that doc's own spans — no
    // second corpus pass, no pairwise stage anywhere (df ≥ 2 is a
    // shingle-keyed aggregate).
    GraftQuery(
      "q_span_removal",
      "cut cross-doc duplicated 3-gram islands out of each doc; emit cleaned text + counts",
      (s, dir) => {
        val ps = positionalShingles(Tables.spread(Tables.documents(s, dir)), Nil).persist()
        val dup = ps.groupBy("shingle")
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") >= 2)
          .select("shingle")
        val m = ps.join(dup, Seq("shingle"), "left_semi").select(col("doc_id"), col("pos"))
        val spans = spanIslands(m)
          .groupBy("doc_id", "g")
          .agg(min(col("pos")).as("s"), (max(col("pos")) + 2).as("e"))
          .groupBy("doc_id")
          .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
        Tables.documents(s, dir)
          .select(col("doc_id"), expr(wordsSql).as("ws"))
          .join(spans, Seq("doc_id"), "left")
          .withColumn("kept", when(col("spans").isNull, col("ws")).otherwise(expr(
            "filter(transform(ws, (w, i) -> " +
              "if(exists(spans, sp -> i >= sp.s and i <= sp.e), cast(null as string), w)), " +
              "x -> x is not null)")))
          .select(col("doc_id"),
            expr("cast(size(ws) as bigint)").as("n_tokens"),
            expr("cast(size(ws) - size(kept) as bigint)").as("removed_tokens"),
            concat_ws(" ", col("kept")).as("cleaned_text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckPositionalShingleCtes,
              |dup AS (SELECT shingle FROM ps
              |        GROUP BY shingle HAVING count(DISTINCT doc_id) >= 2),
              |m AS (SELECT doc_id, pos FROM ps
              |      WHERE shingle IN (SELECT shingle FROM dup)),
              |$duckIslandCtes,
              |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 2 AS e
              |       FROM grp GROUP BY doc_id, g),
              |spl AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans
              |        FROM sp GROUP BY doc_id),
              |cut AS (
              |  SELECT d.doc_id, d.words,
              |         CASE WHEN spl.spans IS NULL THEN d.words ELSE
              |           [d.words[i] for i in range(1, len(d.words) + 1)
              |            if len(list_filter(spl.spans,
              |                 x -> i - 1 >= x['s'] AND i - 1 <= x['e'])) = 0]
              |         END AS kept
              |  FROM docs d LEFT JOIN spl ON spl.doc_id = d.doc_id)
              |SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
              |       CAST(len(words) - len(kept) AS BIGINT) AS removed_tokens,
              |       coalesce(array_to_string(kept, ' '), '') AS cleaned_text
              |FROM cut ORDER BY doc_id""".stripMargin)
    ),

    // E1q PageRank centrality over the near-dup candidate graph — the link
    // analysis a curation pipeline runs to find TEMPLATE HUBS: a boilerplate
    // page that band-collides with many scraped variants accumulates rank
    // from every neighbor, while an isolated duplicate pair stays near the
    // uniform baseline; the ranked list is the human-review queue. Nodes are
    // docs with at least one candidate pair; edges are the symmetric closure
    // of the capped minhash band pairs (so every node has out-degree >= 1 and
    // no rank mass leaks into sinks — the [[graft.operators.LinkAnalysis]]
    // contract).
    //
    // All INTEGER fixed-point (rank 1.0 == 1e9, damping 85/100, per-edge
    // contributions floored before the sum) — see the operator scaladoc for
    // why a floating-point PageRank could never hash-match across engines.
    // The oracle unrolls the same 5 rounds as chained CTEs with `//` floor
    // division, DuckDB's exact twin of Spark's `div`.
    //
    // Scale shape: the edge list is persisted once and reused by all 5
    // rounds; each round is one shuffle join on src + one hash aggregate on
    // dst + one join back to the bounded degree table. Pair generation
    // inherits every LSH guard (band buckets capped at MaxBucket), so edge
    // count is O(docs · bands · cap), never corpus².
    GraftQuery(
      "q_pagerank",
      "integer fixed-point PageRank (5 rounds, d=0.85) over the symmetric minhash candidate graph",
      (s, dir) => {
        val sig  = arraySignatures(Tables.spread(Tables.documents(s, dir)))
        val cand = candidatePairs(sig)
        val edges = cand.select(col("a").as("src"), col("b").as("dst"))
          .union(cand.select(col("b").as("src"), col("a").as("dst")))
          // hash-partition by src AT CACHE TIME: the 5 rounds each join
          // this list on src, and the cached partitioning satisfies the
          // join's clustering requirement — so the edge side never
          // re-exchanges (only the #nodes-row rank table moves per round)
          // and per-round task counts drop from shuffle.partitions to this
          // handful (the rounds were ~15 near-empty 32-task stages whose
          // cost was pure scheduling — VERDICT r8 #6). Sized from CLUSTER
          // width, not the corpus: the capped candidate graph is orders
          // smaller than the corpus at any scale.
          .repartition(math.max(4, s.sparkContext.defaultParallelism / 8),
            col("src"))
          .persist()
        // Phase attribution (VERDICT r14 next-step #5), capture-gated like
        // q_reach_hops': under the bench's dedicated diagnostic evaluation
        // ONLY, `edge_derive` materializes the persisted symmetric edge
        // list (the shared scan→minhash→bucket trunk) and `rank_rounds`
        // counts the 5-round integer fixed point over that cache — so a
        // trunk regression and a per-round join regression read apart in
        // the round artifact. Outside a capture both branches are identity
        // and the lazy graded plan is byte-identical.
        val capturing = graft.Phases.capturing
        if (capturing) graft.Phases.timed("edge_derive") { edges.count(); () }
        val pr = graft.operators.LinkAnalysis.pageRank(edges, 5)
        if (capturing) graft.Phases.timed("rank_rounds") { pr.count(); () }
        pr
          .select(col("id").as("doc_id"), col("deg"), col("rank"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckMinhashCtes,
              |edges AS (SELECT a AS src, b AS dst FROM cand
              |          UNION ALL SELECT b AS src, a AS dst FROM cand),
              |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
              |        FROM edges GROUP BY src),
              |r0 AS (SELECT src AS id, deg, CAST(1000000000 AS BIGINT) AS rank FROM deg),
              |${duckPrIter("r1", "r0")},
              |${duckPrIter("r2", "r1")},
              |${duckPrIter("r3", "r2")},
              |${duckPrIter("r4", "r3")},
              |${duckPrIter("r5", "r4")}
              |SELECT id AS doc_id, deg, rank FROM r5 ORDER BY doc_id""".stripMargin)
    ),

    // E1r sorted-neighborhood dedup (Hernández-Stolfo SNM) — the THIRD
    // classic blocking family next to LSH banding (hash-bucket blocking) and
    // simhash (bit-bucket blocking): sort the corpus by a key that places
    // near-duplicates adjacently, then compare each record only with its W
    // successors in sort order. Here the block is the lowercased first word
    // and the sort key the full text, so template variants (shared prefixes)
    // land next to each other; W = 2.
    //
    // Scale shape — the reason SNM survives 100 TB: the window is
    // PARTITIONED (by block), so the sort is a distributed range sort within
    // hash partitions, never a single-partition global window; each row is
    // compared with at most W neighbors via lead() — ZERO pairwise join, the
    // verify (exact word-set Jaccard) is row-local array math on the carried
    // neighbor arrays. One shuffle total. The oracle forms the same
    // neighbor pairs by row_number self-join (DuckDB's lead over LIST
    // columns is avoided on purpose) — same pairs, different plan.
    GraftQuery(
      "q_sorted_neighborhood",
      "sorted-neighborhood (block = first word, sort = text, W = 2) pairs verified by word-set jaccard",
      (s, dir) => {
        val w = Window.partitionBy(col("blk")).orderBy(col("t"), col("doc_id"))
        val base = Tables.spread(Tables.documents(s, dir))
          .select(col("doc_id"), expr(wordsSql).as("words"),
            expr("trim(coalesce(text, ''))").as("t"))
          .select(col("doc_id"), col("t"),
            expr("array_distinct(words)").as("ws"),
            expr("lower(words[0])").as("blk"))
        val nb = base
          .withColumn("id1", lead(col("doc_id"), 1).over(w))
          .withColumn("ws1", lead(col("ws"), 1).over(w))
          .withColumn("id2", lead(col("doc_id"), 2).over(w))
          .withColumn("ws2", lead(col("ws"), 2).over(w))
        def pairs(idc: String, wsc: String) = nb
          .filter(col(idc).isNotNull)
          .select(
            least(col("doc_id"), col(idc)).as("a"),
            greatest(col("doc_id"), col(idc)).as("b"),
            round(expr(s"size(array_intersect(ws, $wsc))").cast("double") /
              expr(s"size(array_union(ws, $wsc))"), 4).as("jac"))
        pairs("id1", "ws1").union(pairs("id2", "ws2"))
          .filter(col("jac") >= 0.25)
          .orderBy("a", "b")
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, trim(coalesce(text, '')) AS t,
              |         list_distinct($duckWordsSql) AS ws,
              |         lower(($duckWordsSql)[1]) AS blk
              |  FROM documents),
              |rn AS (
              |  SELECT doc_id, t, ws, blk,
              |         row_number() OVER (PARTITION BY blk ORDER BY t, doc_id) AS rn
              |  FROM base),
              |pairs AS (
              |  SELECT least(x.doc_id, y.doc_id) AS a,
              |         greatest(x.doc_id, y.doc_id) AS b,
              |         round(CAST(len(list_intersect(x.ws, y.ws)) AS DOUBLE)
              |               / len(list_distinct(list_concat(x.ws, y.ws))), 4) AS jac
              |  FROM rn x JOIN rn y
              |    ON x.blk = y.blk AND (y.rn = x.rn + 1 OR y.rn = x.rn + 2))
              |SELECT a, b, jac FROM pairs WHERE jac >= 0.25 ORDER BY a, b""".stripMargin)
    ),

    // E1s triangle counting over the near-dup candidate graph — the
    // clustering-coefficient signal that tells TEMPLATE CLUSTERS (dense,
    // triangle-rich: every scraped variant collides with every other) apart
    // from CHAIN artifacts (a shared boilerplate sentence linking otherwise
    // unrelated docs: high degree, near-zero triangles). PageRank (E1q)
    // ranks hubs; this classifies their neighborhoods.
    //
    // The classic ordered-triple formulation: edges held as a < b, and a
    // triangle (a < b < c) found by joining edge (a,b) with adjacency
    // (b,c) and closing with (a,c) — each triangle found exactly ONCE, no
    // distinct, no orientation bookkeeping. Wedge work is bounded because
    // the edge set comes from MaxBucket-capped band buckets (max degree ≤
    // bands·(cap−1)), the same upstream guard every pair consumer rides —
    // the 100 TB wedge explosion is capped before it can exist. Per-node
    // participation = each found triangle exploded to its 3 corners.
    GraftQuery(
      "q_triangles",
      "per-doc triangle participation in the minhash candidate graph (ordered-triple join)",
      (s, dir) => {
        val sig  = arraySignatures(Tables.spread(Tables.documents(s, dir)))
        val cand = candidatePairs(sig).persist()
        graft.operators.LinkAnalysis.triangleCounts(cand).orderBy("doc_id")
      },
      Some(s"""WITH $duckMinhashCtes,
              |tri AS (
              |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
              |  FROM cand e1
              |  JOIN cand e2 ON e2.a = e1.b
              |  JOIN cand e3 ON e3.a = e1.a AND e3.b = e2.b),
              |corners AS (
              |  SELECT a AS doc_id FROM tri
              |  UNION ALL SELECT b FROM tri
              |  UNION ALL SELECT c FROM tri)
              |SELECT doc_id, count(*) AS n_triangles
              |FROM corners GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // E1t k-core peeling — the density classifier that completes the graph
    // quartet (components find WHO is connected, PageRank ranks hubs,
    // triangles classify neighborhoods, k-core finds the HARD KERNEL):
    // repeatedly drop nodes with degree < 2 and their edges, and what
    // survives is the cycle-bearing subgraph of mutually-confirming
    // duplicates — pendant chains (one shared sentence linking a doc to a
    // cluster) peel away, exactly the rows a delete-list should NOT act on
    // without verification. Fixed 4 peel rounds (idempotent once converged,
    // so an upper bound — the pageRank move), each round materialized
    // through Lineage so the loop stays 4 flat jobs instead of a 3⁴
    // expression tree (see [[graft.operators.LinkAnalysis.kCore]]).
    GraftQuery(
      "q_kcore",
      "2-core of the minhash candidate graph after 4 peel rounds: survivors + degree",
      (s, dir) => {
        val sig  = arraySignatures(Tables.spread(Tables.documents(s, dir)))
        // partition by endpoint `a` at cache time: round 1's first
        // semi-join is on a (the b-join still exchanges — peeling
        // alternates keys), and the narrow partition count keeps the 4
        // materialized rounds from running near-empty 32-task stages
        // (the q_pagerank scheduling fix, VERDICT r8 #6)
        val cand = candidatePairs(sig)
          .repartition(math.max(4, s.sparkContext.defaultParallelism / 8),
            col("a"))
          .persist()
        graft.operators.LinkAnalysis.kCore(cand, 2, 4)
          .select(col("id").as("doc_id"), col("deg"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckMinhashCtes,
              |e0 AS (SELECT a, b FROM cand),
              |${duckPeel(1, 0)},
              |${duckPeel(2, 1)},
              |${duckPeel(3, 2)},
              |${duckPeel(4, 3)}
              |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS deg
              |FROM (SELECT a AS id FROM e4 UNION ALL SELECT b AS id FROM e4) n
              |GROUP BY id ORDER BY doc_id""".stripMargin)
    ),

    // E1v label-propagation communities — the graph quintet's DETECTOR
    // (components: who is connected; PageRank: which hubs matter;
    // triangles: what kind of neighborhood; k-core: the hard kernel; LPA:
    // where the community BOUNDARIES are): 4 synchronous plurality-vote
    // rounds over the same symmetric candidate graph as q_pagerank. The
    // curation read: a connected component glued by one chain artifact
    // splits back into its dense template communities here — exactly the
    // rows where community ≠ q_dup_clusters' component root are the chain
    // suspects a reviewer should cut. Deterministic (synchronous + smallest-
    // label tie-break, min(struct(-cnt, lab)) — no corpus window); see
    // [[graft.operators.LinkAnalysis.labelPropagation]] for the oscillation
    // / bounded-rounds argument.
    GraftQuery(
      "q_label_prop",
      "4-round synchronous plurality label propagation over the minhash candidate graph",
      (s, dir) => {
        val sig  = arraySignatures(Tables.spread(Tables.documents(s, dir)))
        val cand = candidatePairs(sig)
        val edges = cand.select(col("a").as("src"), col("b").as("dst"))
          .union(cand.select(col("b").as("src"), col("a").as("dst")))
          // hash-partition by src at cache time — every LPA round joins the
          // edge list on src, so the cached partitioning satisfies the
          // join's clustering requirement and only the #nodes-row label
          // table moves per round (the q_pagerank move, VERDICT r8 #6).
          // WIDER than pagerank's cache (/2, not /8): LPA's per-round
          // (dst, label) aggregate carries nodes×labels cardinality — at
          // /8 the narrow partitioning serialized it and the query got
          // SLOWER (measured 2.7 s vs 1.9 baseline); /2 keeps the
          // no-re-exchange benefit without starving the aggregate.
          .repartition(math.max(4, s.sparkContext.defaultParallelism / 2),
            col("src"))
          .persist()
        graft.operators.LinkAnalysis.labelPropagation(edges, 4)
          .select(col("id").as("doc_id"), col("lab").as("community"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckMinhashCtes,
              |edges AS (SELECT a AS src, b AS dst FROM cand
              |          UNION ALL SELECT b AS src, a AS dst FROM cand),
              |l0 AS (SELECT DISTINCT src AS id, src AS lab FROM edges),
              |${duckLpaIter("l1", "l0")},
              |${duckLpaIter("l2", "l1")},
              |${duckLpaIter("l3", "l2")},
              |${duckLpaIter("l4", "l3")}
              |SELECT id AS doc_id, lab AS community FROM l4 ORDER BY doc_id""".stripMargin)
    ),

    // E1x bounded-hop BFS reachability — the graph family's distance
    // primitive (components: "same cluster?"; PageRank: "how central?";
    // this: "HOW FAR from the reviewed core?"): exact hop counts within 3
    // edges of the seed docs (doc_id % 10 == 0 — a deterministic stand-in
    // for a human-reviewed set) over the same symmetric minhash candidate
    // graph as q_pagerank. The curation read: hop 1 from a confirmed
    // template is a strong dup suspect, hop 3 a weak one; unreached docs
    // never materialize. See [[graft.operators.LinkAnalysis.bfsHops]] for
    // the min-plus/self-loop formulation (one join + one min-agg per round,
    // linear plan growth).
    GraftQuery(
      "q_reach_hops",
      "3-round BFS hop distance from the %10==0 seed docs over the candidate graph",
      (s, dir) => {
        val sig  = arraySignatures(Tables.spread(Tables.documents(s, dir)))
        val cand = candidatePairs(sig)
        val edges = cand.select(col("a").as("src"), col("b").as("dst"))
          .union(cand.select(col("b").as("src"), col("a").as("dst")))
          .persist()
        // Phase attribution (VERDICT r13 next-step #5), capture-gated like
        // gramPairSizes': bfsHops is fully lazy, so under the bench's
        // dedicated diagnostic evaluation ONLY, `edge_derive` materializes
        // the (already-persisted-in-the-plain-plan) symmetric candidate
        // edge list — the shared scan→minhash→bucket trunk — and
        // `hop_rounds` then counts the 3-round min-plus relaxation over
        // that cache, so an edge-pipeline regression and a relaxation
        // regression are distinguishable in the round artifact. Outside a
        // capture both branches are identity and the lazy graded plan is
        // byte-identical.
        val capturing = graft.Phases.capturing
        if (capturing) graft.Phases.timed("edge_derive") { edges.count(); () }
        val seeds = edges.select(col("src").as("id")).distinct()
          .filter(col("id") % 10 === 0)
        val hops = graft.operators.LinkAnalysis.bfsHops(edges, seeds, 3)
        if (capturing) graft.Phases.timed("hop_rounds") { hops.count(); () }
        hops
          .select(col("id").as("doc_id"), col("hop"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $duckMinhashCtes,
              |edges AS (SELECT a AS src, b AS dst FROM cand
              |          UNION ALL SELECT b AS src, a AS dst FROM cand),
              |n AS (SELECT DISTINCT src AS id FROM edges),
              |e2 AS (SELECT src, dst, CAST(1 AS BIGINT) AS w FROM edges
              |       UNION ALL SELECT id, id, CAST(0 AS BIGINT) FROM n),
              |h0 AS (SELECT id, CAST(0 AS BIGINT) AS hop FROM n WHERE id % 10 = 0),
              |${duckBfsIter("h1", "h0")},
              |${duckBfsIter("h2", "h1")},
              |${duckBfsIter("h3", "h2")}
              |SELECT id AS doc_id, hop FROM h3 ORDER BY doc_id""".stripMargin)
    )
  )

  /** One DuckDB synchronous LPA round: neighbor-label counts of `in`,
    * plurality pick with (cnt DESC, lab ASC) tie-break — the oracle twin of
    * one [[graft.operators.LinkAnalysis.labelPropagation]] round (the
    * row_number form picks the identical row the Spark side's
    * min(struct(-cnt, lab)) aggregate does).
    */
  private def duckLpaIter(out: String, in: String): String =
    s"""$out AS (
       |  SELECT dst AS id, lab FROM (
       |    SELECT dst, lab,
       |           row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, lab) AS rk
       |    FROM (SELECT e.dst, l.lab, count(*) AS cnt
       |          FROM edges e JOIN $in l ON l.id = e.src
       |          GROUP BY e.dst, l.lab) c) r
       |  WHERE rk = 1)""".stripMargin

  /** One DuckDB min-plus BFS round — the oracle twin of one
    * [[graft.operators.LinkAnalysis.bfsHops]] round: relax every edge of
    * the self-loop-augmented list `e2` from the previous distance table.
    */
  private def duckBfsIter(out: String, in: String): String =
    s"""$out AS (SELECT e2.dst AS id, min(h.hop + e2.w) AS hop
       |         FROM e2 JOIN $in h ON h.id = e2.src GROUP BY e2.dst)""".stripMargin

  /** One DuckDB k-core peel round (k = 2): degrees of e`in`, keep-list,
    * e`out` — the oracle twin of one [[graft.operators.LinkAnalysis.kCore]]
    * round.
    */
  private def duckPeel(out: Int, in: Int): String =
    s"""d$out AS (SELECT id, count(*) AS deg
       |          FROM (SELECT a AS id FROM e$in UNION ALL SELECT b AS id FROM e$in) n
       |          GROUP BY id),
       |k$out AS (SELECT id FROM d$out WHERE deg >= 2),
       |e$out AS (SELECT e$in.a, e$in.b FROM e$in
       |          JOIN k$out x ON x.id = e$in.a
       |          JOIN k$out y ON y.id = e$in.b)""".stripMargin

  /** (a, b, dist) simhash near-dup pairs, pre-ORDER BY — factored so the
    * cross-modal composite (`q_crossmodal_dups`, MultimodalQueries) joins
    * the exact pipeline q_simhash_pairs grades rather than a re-derivation.
    *
    * Hot-block cap (same MaxBucket guard as the minhash LSH stage): a
    * degenerate block — e.g. many empty docs sharing one fingerprint —
    * would otherwise make the in-block join AND its output |block|².
    * In-bucket expansion runs from ONE collected (capped) member list — the
    * minhashCandidates shape — rather than a self-join whose two branches
    * would each recompute the full simhash pipeline.
    */
  private[graft] def simhashPairsFrame(s: SparkSession, dir: String): DataFrame = {
    def rotBlock(r: Int) =
      s"shiftright((shiftleft(simhash, $r) | shiftright(simhash, ${32 - r})) & 4294967295L, 16)"
    val buckets = simhashDf(s, dir)
      .select(col("doc_id"), col("simhash"),
        posexplode(array(Rotations.map(r => expr(rotBlock(r))): _*)).as(Seq("pass", "block")))
      .groupBy("pass", "block")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("simhash")))).as("ms"))
      .filter(size(col("ms")).between(2, MaxBucket))
    buckets
      .select(explode(expr(pairExpansionSql("ms")((x, y) =>
        s"named_struct('a', $x.doc_id, 'sa', $x.simhash, 'b', $y.doc_id, 'sb', $y.simhash)"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"),
        expr("bit_count(p.sa ^ p.sb)").cast("long").as("dist"))
      .filter(col("dist") <= 6)
      .distinct()
  }

  /** DuckDB CTE chain ending in `spairs(a, b, dist)` — the oracle twin of
    * [[simhashPairsFrame]], s-prefixed names so it composes with the phash
    * chain in one WITH clause.
    */
  private[graft] def duckSimhashPairsCtes: String = {
    val passes = Rotations.zipWithIndex.map { case (r, p) =>
      s"""SELECT doc_id, simhash, $p AS pass,
         |       (((simhash << $r) | (simhash >> ${32 - r})) & 4294967295) >> 16 AS block
         |FROM sh""".stripMargin
    }.mkString("\n      UNION ALL\n")
    s"""sh AS ($duckSimhashSql),
       |se AS (
       |$passes),
       |sb AS (SELECT doc_id, simhash, pass, block,
       |              count(*) OVER (PARTITION BY pass, block) AS bn
       |       FROM se),
       |scap AS (SELECT doc_id, simhash, pass, block FROM sb WHERE bn <= $MaxBucket),
       |spairs AS (
       |  SELECT DISTINCT a, b, dist FROM (
       |    SELECT l.doc_id AS a, r.doc_id AS b,
       |           CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS dist
       |    FROM scap l JOIN scap r ON l.pass = r.pass AND l.block = r.block
       |                           AND l.doc_id < r.doc_id) p
       |  WHERE dist <= 6)""".stripMargin
  }

  /** One DuckDB PageRank round: `out` from `in` — the oracle twin of one
    * [[graft.operators.LinkAnalysis.pageRank]] iteration (floor-divided
    * per-edge contributions summed per dst, then base + damped total).
    */
  private def duckPrIter(out: String, in: String): String =
    s"""$out AS (
       |  SELECT d.src AS id, d.deg,
       |         CAST(150000000 + (85 * coalesce(s.recv, 0)) // 100 AS BIGINT) AS rank
       |  FROM deg d LEFT JOIN (
       |    SELECT e.dst, CAST(sum(r.rank // r.deg) AS BIGINT) AS recv
       |    FROM edges e JOIN $in r ON r.id = e.src GROUP BY e.dst) s
       |  ON s.dst = d.src)""".stripMargin

  /** The q_longest_dup_span pipeline over any frame with (doc_id, text) —
    * factored out so SuffixSpanSpec can pin it against a brute-force
    * all-pairs longest-common-substring oracle on arbitrary corpora (the
    * adjacency-captures-max and 2-gram-bucketing arguments in the query doc
    * are exactly the kind of reasoning a test should hold to account).
    */
  private[graft] def longestDupSpans(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), expr(wordsSql).as("ws"))
    val sfx = d.filter(size(col("ws")) >= MinSpan)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(ws) - ${MinSpan - 1}), " +
          s"i -> named_struct('pos', i, 'sfx', slice(ws, i, $SfxK)))")).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.sfx").as("sfx"))
      .withColumn("b", expr("concat_ws(' ', sfx[0], sfx[1])"))
    // order by the token ARRAY itself: element-wise array ordering equals
    // the space-joined string order under the query's documented
    // precondition (' ' sorts below every token character, so a prefix
    // relationship breaks ties the same way shorter-array-first does) —
    // the former space-joined `key` column duplicated the whole suffix
    // payload into the window shuffle purely for ordering (~40 MB → ~24 MB
    // shuffled at sf0.1; guide §2.3 "shuffle fewer bytes")
    val w = Window.partitionBy("b").orderBy(col("sfx"), col("doc_id"), col("pos"))
    val spans = sfx
      .withColumn("p_sfx", lag(col("sfx"), 1).over(w))
      .withColumn("p_doc", lag(col("doc_id"), 1).over(w))
      .withColumn("n_sfx", lead(col("sfx"), 1).over(w))
      .withColumn("n_doc", lead(col("doc_id"), 1).over(w))
      .withColumn("span",
        greatest(expr(lcpSql("sfx", "p_sfx", "p_doc")),
          expr(lcpSql("sfx", "n_sfx", "n_doc"))))
      .groupBy("doc_id")
      .agg(max(expr(s"if(span >= $MinSpan, span, cast(0 as bigint))"))
        .as("longest_dup"))
    d.select("doc_id")
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("longest_dup"), lit(0L)).as("longest_dup"))
      .orderBy("doc_id")
  }

  /** The novelty report over (doc_id, shingle) rows and a (shingle,
    * first_doc) first-occurrence table — single-sourced between the graded
    * q_novelty_curve (where `first` is the corpus's own min-doc aggregate)
    * and the streaming monitor ([[graft.streaming.Sketches.noveltyOf]],
    * where `first` is the persisted store) so the two cannot drift on the
    * keep-lowest-id convention.
    */
  private[graft] def noveltyFrom(sh: DataFrame, first: DataFrame): DataFrame =
    sh.join(first, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(expr("if(first_doc = doc_id, cast(1 as bigint), cast(0 as bigint))"))
          .as("n_novel"))
      .withColumn("novelty_bp", expr("(n_novel * 10000) div n_shingles"))
      .select("doc_id", "n_shingles", "n_novel", "novelty_bp")
      .orderBy("doc_id")

  /** Token-LCP of suffix array columns `a` and `nb` gated on the neighbor
    * belonging to ANOTHER document (`nbDoc`): 0 when absent or same-doc,
    * else the 0-based index of the first element-wise mismatch of the two
    * min-length-trimmed prefixes (no mismatch → the shorter length).
    */
  private def lcpSql(a: String, nb: String, nbDoc: String): String =
    s"if($nb is null or $nbDoc = doc_id, cast(0 as bigint), " +
      s"cast(coalesce(nullif(array_position(zip_with(slice($a, 1, size($nb)), " +
      s"slice($nb, 1, size($a)), (x, y) -> x <=> y), false), 0) - 1, " +
      s"least(size($a), size($nb))) as bigint))"

  /** DuckDB twin of [[lcpSql]] — the same nullif(…, 0) guard as the Spark
    * side (DuckDB's list_position reports not-found as 0, exactly like
    * Spark's array_position; an all-equal prefix must fall through to the
    * min length, not to 0−1 = −1).
    */
  private def duckLcpSql(a: String, nb: String, nbDoc: String): String =
    s"CASE WHEN $nb IS NULL OR $nbDoc = doc_id THEN 0 ELSE " +
      s"coalesce(nullif(list_position(list_transform(range(1, least(len($a), len($nb)) + 1), " +
      s"i -> $a[i] = $nb[i]), false), 0) - 1, least(len($a), len($nb))) END"
}
