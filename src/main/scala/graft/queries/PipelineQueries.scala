package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Scalars
import graft.operators.Relational

/** Pipeline-composite queries — the reference's two *serving/export* paths
  * composed end-to-end from the engine's combinators (SURVEY.md §2.1 S7/S8,
  * §7.1 `pipeline`):
  *
  *  - S7 `GET /pets` JSON shape: `{"count": n, "pets": [...]}`
  *    (server.py:463-490) — the reference's single most-used endpoint.
  *  - S8 CSV export encoding: fixed 17-column projection with ""-fill
  *    (P1, pet_scraper.py:341-361), booleans encoded "True"/"False"/""
  *    (X5, pet_scraper.py:439-443), newlines escaped to literal \n
  *    (X4, pet_scraper.py:415-417) — i.e. `GET /pets.csv`
  *    (server.py:493-518, docs/index.html:373-375).
  *
  * Scale posture: S7's total count is a 1-row aggregate broadcast-joined onto
  * the rows (no global window, no collect); S8 is a pure horizontal
  * projection — both embarrassingly parallel at 100 TB.
  */
object PipelineQueries {

  import Dialect.{duckWordsSql, wordsSql}

  /** Declared export column order for the documents-shaped export (the P1
    * analog of get_pet_csv_fields; `image` is deliberately absent from the
    * source so the ""-fill path is exercised).
    */
  private val ExportCols = Seq("link", "pet_type", "about_me", "vaccinated", "image")

  val queries: Seq[GraftQuery] = Seq(

    // S7: the {count, pets} serving shape. The count is computed once as a
    // 1-row aggregate and broadcast onto every row — the distributed version
    // of `jsonify({"count": len(pets), "pets": pets})`.
    GraftQuery(
      "q_export_json_shape",
      "GET /pets shape: total count stamped on every served row",
      (s, dir) => {
        val pets  = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        val total = pets.agg(count(lit(1)).as("total_count"))
        pets.crossJoin(broadcast(total))
          .select(col("total_count"), col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""SELECT (SELECT count(*) FROM customer) AS total_count,
             |       c_custkey, c_name, c_mktsegment
             |FROM customer ORDER BY c_custkey""".stripMargin)
    ),

    // S8 + P1: the CSV export encoding pipeline. Source columns are renamed
    // into the pets shape, booleans go through the X2 parse (with its quirks)
    // then the X5 encode, about-text through the X4 escape, and
    // fixedProjection imposes the declared column order with ""-fill for the
    // absent `image` column.
    GraftQuery(
      "q_csv_export_encode",
      "CSV export row encoding: fixed column order, bool encode, newline escape",
      (s, dir) => {
        val staged = Tables.documents(s, dir)
          .select(
            concat(lit("doc:"), col("doc_id")).as("link"),
            col("lang").as("pet_type"),
            Scalars.escapeNewlines(
              concat(coalesce(col("text"), lit("")), lit("\r\n"), col("source"))).as("about_me"),
            Scalars.encodeBool(Scalars.parseBoolean(col("lang"))).as("vaccinated"))
        Relational.fixedProjection(staged, ExportCols).orderBy("link")
      },
      Some(s"""SELECT 'doc:' || doc_id AS link,
              |       coalesce(lang, '') AS pet_type,
              |       coalesce(replace(replace(coalesce(text, '') || chr(13) || chr(10) || source,
              |                       chr(13), '\\n'), chr(10), '\\n'), '') AS about_me,
              |       CASE WHEN b IS NULL THEN '' WHEN b THEN 'True' ELSE 'False' END AS vaccinated,
              |       '' AS image
              |FROM (SELECT doc_id, lang, text, source, ${Scalars.parseBooleanSql("lang")} AS b
              |      FROM documents) t
              |ORDER BY link""".stripMargin)
    ),

    // The curation funnel: the canonical LLM-data pipeline composed as ONE
    // plan — exact dedup (keep the min doc_id per content hash) → quality
    // gate (≥ 20 tokens) → language gate (en) — with per-source attrition
    // counts and the surviving token budget. The stages are nested flags on
    // one scan, so the whole funnel costs one keyed window (content hash)
    // plus one #sources-row aggregate — how a 100 TB curation run reports
    // its yield without rescanning per stage.
    GraftQuery(
      "q_curation_funnel",
      "dedup -> quality -> lang funnel: per-source attrition + token budget",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
        Tables.documents(s, dir)
          .withColumn("toks", expr(s"cast(size($wordsSql) as bigint)"))
          .withColumn("d", (col("doc_id") === min("doc_id").over(w)).cast("bigint"))
          .withColumn("q", (col("d") === 1 && col("toks") >= 20).cast("bigint"))
          .withColumn("e", (col("q") === 1 && col("lang") === "en").cast("bigint"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_input"),
            sum("d").as("n_unique"), sum("q").as("n_quality"), sum("e").as("n_kept"),
            coalesce(sum(when(col("e") === 1, col("toks"))), lit(0L)).as("tok_budget"))
          .orderBy("source")
      },
      Some(s"""SELECT source, count(*) AS n_input,
              |       CAST(sum(d) AS BIGINT) AS n_unique,
              |       CAST(sum(q) AS BIGINT) AS n_quality,
              |       CAST(sum(e) AS BIGINT) AS n_kept,
              |       CAST(coalesce(sum(CASE WHEN e = 1 THEN toks END), 0) AS BIGINT) AS tok_budget
              |FROM (
              |  SELECT source, toks, d,
              |         CASE WHEN d = 1 AND toks >= 20 THEN 1 ELSE 0 END AS q,
              |         CASE WHEN d = 1 AND toks >= 20 AND lang = 'en' THEN 1 ELSE 0 END AS e
              |  FROM (
              |    SELECT source, lang, len($duckWordsSql) AS toks,
              |           CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS d
              |    FROM documents) h) f
              |GROUP BY source ORDER BY source""".stripMargin)
    ),

    // E6b URL-level curation (the RefinedWeb/C4 move the reference's X6
    // normalization hints at, done at corpus scale): every doc gets a
    // deterministic synthetic URL (subdomain/tld/tracking-params derived
    // from doc_id), then the pipeline canonicalizes (strip utm_* params +
    // dangling separators), extracts host and REGISTERED DOMAIN (last two
    // dot-labels — 'cdn.wiki.org' and 'www.wiki.org' roll up together, the
    // whole point of domain-level curation), and rolls up per domain: doc
    // and distinct-source counts, total chars, how many raw URLs carried
    // tracking params, and a deterministic 10% blocklist flag (hash60 of
    // the domain — the shared md5 construction, so both engines agree).
    //
    // Scale shape: one scan, row-local regex/string ops, ONE hash aggregate
    // keyed by domain (bounded by the registered-domain space, far below
    // corpus cardinality at 100 TB — this rollup is exactly how a crawl is
    // summarized cheaply). No window, no join.
    GraftQuery(
      "q_domain_stats",
      "URL canonicalize -> registered-domain rollup: docs, sources, chars, tracking, blocklist",
      (s, dir) =>
        domainReport(domainPairs(domainRows(Tables.spread(Tables.documents(s, dir))))),
      Some(s"""WITH base AS (
              |  SELECT doc_id, source, n_chars,
              |         regexp_replace(lower(coalesce(source, '')), '[^a-z0-9]', '', 'g') AS src
              |  FROM documents),
              |u AS (
              |  SELECT doc_id, source, n_chars,
              |    'https://' || (['www.', 'cdn.', ''])[CAST(doc_id % 3 AS INTEGER) + 1] || src
              |      || (['.com', '.org', '.net', '.io'])[CAST(doc_id % 4 AS INTEGER) + 1]
              |      || '/p/' || doc_id
              |      || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&utm_campaign=x&id=' || doc_id
              |              ELSE '?id=' || doc_id END AS url
              |  FROM base),
              |dm AS (
              |  SELECT doc_id, source, n_chars, url,
              |    array_to_string((string_split(regexp_extract(
              |      regexp_replace(regexp_replace(url, 'utm_[a-z]+=[^&]*&?', '', 'g'), '[?&]$$', ''),
              |      '^https://([^/?]+)', 1), '.'))[-2:], '.') AS domain
              |  FROM u)
              |SELECT domain,
              |  count(*) AS n_docs,
              |  CAST(count(DISTINCT coalesce(source, '')) AS BIGINT) AS n_sources,
              |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
              |  CAST(sum(CASE WHEN contains(url, 'utm_') THEN 1 ELSE 0 END) AS BIGINT) AS n_tracked,
              |  CASE WHEN (${Scalars.duckHexHash60Sql("domain")}) % 10 = 0
              |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS blocked
              |FROM dm GROUP BY domain ORDER BY domain""".stripMargin)
    )
  )

  /** (doc_id, source, n_chars, url, domain) — URL synthesis, tracking-param
    * canonicalization, and registered-domain extraction for every document.
    * Single-sourced between the graded `q_domain_stats` and the streaming
    * rollup ([[graft.streaming.Sketches.updateDomains]]) so the two cannot
    * drift.
    */
  private[graft] def domainRows(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      // NULL source normalizes to the empty-string source HERE, so the
      // n_sources distinct count agrees with SQL's count(DISTINCT ...)
      // convention in the oracle (which drops NULL) — without it, a
      // null-source doc forms its own group key on the Spark side only,
      // off-by-one per affected domain on any corpus with missing sources
      .withColumn("source", expr("coalesce(source, '')"))
      .withColumn("src", expr("regexp_replace(lower(source), '[^a-z0-9]', '')"))
      .withColumn("url", expr(
        "concat('https://', element_at(array('www.', 'cdn.', ''), cast(doc_id % 3 as int) + 1), " +
          "src, element_at(array('.com', '.org', '.net', '.io'), cast(doc_id % 4 as int) + 1), " +
          "'/p/', cast(doc_id as string), " +
          "if(doc_id % 2 = 0, concat('?utm_source=feed&utm_campaign=x&id=', doc_id), " +
          "concat('?id=', doc_id)))"))
      .withColumn("canon", expr(
        "regexp_replace(regexp_replace(url, 'utm_[a-z]+=[^&]*&?', ''), '[?&]$', '')"))
      .withColumn("host", expr("regexp_extract(canon, '^https://([^/?]+)', 1)"))
      .withColumn("domain", expr("array_join(slice(split(host, '\\\\.'), -2, 2), '.')"))
      .select("doc_id", "source", "n_chars", "url", "domain")

  /** Per-(domain, source) partial sums — the mergeable state shape: every
    * column is a sum monoid, so batch partials ADD associatively (the
    * distinct-source count the report needs becomes a row count over this
    * grain, which is why source stays in the key instead of a non-mergeable
    * countDistinct). State is bounded by |domains|·|sources| forever.
    */
  private[graft] def domainPairs(rows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    rows.groupBy("domain", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(when(col("url").contains("utm_"), lit(1L)).otherwise(lit(0L))).as("n_tracked"))

  /** The graded rollup from (possibly batch-merged) per-(domain, source)
    * partials: domain-level sums, distinct sources as the pair-row count,
    * and the deterministic hash60 blocklist flag.
    */
  private[graft] def domainReport(pairs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    pairs.groupBy("domain")
      .agg(sum("n_docs").as("n_docs"), count(lit(1)).as("n_sources"),
        sum("total_chars").as("total_chars"), sum("n_tracked").as("n_tracked"))
      .withColumn("blocked",
        expr(s"if(pmod(${Scalars.hexHash60Sql("domain")}, 10) = 0, 1L, 0L)"))
      .select("domain", "n_docs", "n_sources", "total_chars", "n_tracked", "blocked")
      .orderBy("domain")
}
