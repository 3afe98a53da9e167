package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Scalars
import graft.operators.Relational

/** Quality filters (F1–F4), the keyed upsert/merge (J4/P3), and the
  * compaction summary (A5). SURVEY.md §2.3–2.5.
  */
object FilterMergeQueries {

  private val missingSql = "(%s IS NULL OR trim(CAST(%s AS VARCHAR)) = '')"
  private def missSql(c: String) = missingSql.format(c, c)

  val queries: Seq[GraftQuery] = Seq(

    // F1 placeholder filter (pet_scraper.py:375-377): drop rows whose
    // normalized segment is in the placeholder set.
    GraftQuery(
      "q_placeholder_filter",
      "drop placeholder segments (lower+trim membership)",
      (s, dir) =>
        Relational.placeholderFilter(
          Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment"),
          col("c_mktsegment"), Seq("building", "machinery")
        ).orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE lower(trim(c_mktsegment)) NOT IN ('building', 'machinery')
             |ORDER BY c_custkey""".stripMargin)
    ),

    // F2 null-ratio filter (pet_scraper.py:364-407): 4 checked fields (text +
    // token slots 1/6/12), drop when ≥ 50% missing. '' and NULL both count as
    // missing (SURVEY.md §7.4#6).
    GraftQuery(
      "q_null_ratio_filter",
      "drop documents with >= 2 of 4 derived fields missing",
      (s, dir) => {
        val toks   = split(trim(coalesce(col("text"), lit(""))), " +")
        val fields = Seq(col("text"), try_element_at(toks, lit(1)),
          try_element_at(toks, lit(6)), try_element_at(toks, lit(12)))
        Tables.documents(s, dir)
          .withColumn("missing_cnt", Scalars.missingCount(fields).cast("long"))
          .filter(Relational.nullRatioKeep(fields, 0.5))
          .select("doc_id", "missing_cnt")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, missing_cnt FROM (
              |  SELECT doc_id, CAST(
              |      (CASE WHEN ${missSql("text")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[1]")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[6]")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[12]")} THEN 1 ELSE 0 END) AS BIGINT) AS missing_cnt
              |  FROM (SELECT doc_id, text,
              |          string_split_regex(trim(coalesce(text,'')), ' +') AS toks
              |        FROM documents) s) t
              |WHERE missing_cnt < 2 ORDER BY doc_id""".stripMargin)
    ),

    // F3 field-failure validity (verify.py:9-37): 7 checked fields, invalid
    // iff ≥ 3 failures; emit the verdict rather than filtering.
    GraftQuery(
      "q_field_failure_filter",
      "per-document failed-field count and validity verdict",
      (s, dir) => {
        val toks = split(trim(coalesce(col("text"), lit(""))), " +")
        val fields = Seq(col("lang"), col("source"),
          try_element_at(toks, lit(2)), try_element_at(toks, lit(4)),
          try_element_at(toks, lit(8)), try_element_at(toks, lit(10)),
          try_element_at(toks, lit(12)))
        Tables.documents(s, dir)
          .withColumn("failed", Scalars.missingCount(fields).cast("long"))
          .withColumn("is_valid", Relational.fieldFailureValid(fields, 3))
          .select("doc_id", "failed", "is_valid")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, failed, failed < 3 AS is_valid FROM (
              |  SELECT doc_id, CAST(
              |      (CASE WHEN ${missSql("lang")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("source")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[2]")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[4]")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[8]")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[10]")} THEN 1 ELSE 0 END)
              |    + (CASE WHEN ${missSql("toks[12]")} THEN 1 ELSE 0 END) AS BIGINT) AS failed
              |  FROM (SELECT doc_id, lang, source,
              |          string_split_regex(trim(coalesce(text,'')), ' +') AS toks
              |        FROM documents) s) t
              |ORDER BY doc_id""".stripMargin)
    ),

    // F4 delete-by-predicate compaction survivors (server.py:226-315).
    GraftQuery(
      "q_delete_survivors",
      "compaction: keep rows passing the validity predicate",
      (s, dir) =>
        Relational.deleteSurvivors(
          Tables.events(s, dir).select("event_id", "event_type", "value"),
          valid = !(col("event_type") === "error") && col("value") >= 1.0
        ).orderBy("event_id"),
      Some("""SELECT event_id, event_type, value FROM events
             |WHERE NOT (event_type = 'error') AND value >= 1.0
             |ORDER BY event_id""".stripMargin)
    ),

    // A5 removed-vs-remaining summary (server.py:308).
    GraftQuery(
      "q_compaction_summary",
      "one-pass removed/remaining/total counts for the compaction predicate",
      (s, dir) =>
        Relational.compactionSummary(
          Tables.events(s, dir),
          valid = !(col("event_type") === "error") && col("value") >= 1.0),
      Some("""SELECT
             |  CAST(sum(CASE WHEN NOT (event_type = 'error') AND value >= 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS remaining,
             |  CAST(sum(CASE WHEN NOT (event_type = 'error') AND value >= 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS removed,
             |  count(*) AS total
             |FROM events""".stripMargin)
    ),

    // J4/P3 keyed upsert merge (pet_scraper.py:410-466): modulo-split so every
    // scale factor exercises update-in-place (keys 5-7 mod 10), append (8-9),
    // and column preservation (o_custkey/o_orderpriority absent from updates).
    GraftQuery(
      "q_upsert_merge",
      "full-outer keyed merge: updates win, absent columns preserved",
      (s, dir) => {
        val orders   = Tables.orders(s, dir)
        val existing = orders.filter(col("o_orderkey") % 10 < 8)
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        val updates = orders.filter(col("o_orderkey") % 10 >= 5)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") + 10.0).as("o_totalprice"))
        Relational.upsertMerge(existing, updates, "o_orderkey")
          .orderBy("o_orderkey")
      },
      Some("""WITH existing AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
             |  FROM orders WHERE o_orderkey % 10 < 8),
             |updates AS (
             |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 10.0 AS o_totalprice
             |  FROM orders WHERE o_orderkey % 10 >= 5)
             |SELECT coalesce(u.o_orderkey, e.o_orderkey) AS o_orderkey,
             |       e.o_custkey AS o_custkey,
             |       coalesce(u.o_orderstatus, e.o_orderstatus) AS o_orderstatus,
             |       coalesce(u.o_totalprice, e.o_totalprice) AS o_totalprice,
             |       e.o_orderpriority AS o_orderpriority
             |FROM existing e FULL OUTER JOIN updates u ON e.o_orderkey = u.o_orderkey
             |ORDER BY o_orderkey""".stripMargin)
    )
  )
}
