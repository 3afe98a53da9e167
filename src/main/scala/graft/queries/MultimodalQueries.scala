package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** E5 multimodal byte-level surface (SURVEY.md §2.11): the graded slice of
  * [[graft.operators.Multimodal]] — payload byte statistics computed on the
  * UTF-8 encoding of `documents.text` (the environment has no real media
  * bytes, so text bytes stand in; the operators are payload-agnostic).
  * Decode-dependent features (width/height/checksum) are deliberately
  * ungraded: the decoder is a stub (Multimodal.fakeDecode) covered by
  * MultimodalSpec instead.
  */
object MultimodalQueries {

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery(
      "q_multimodal_bytes",
      "payload byte stats: utf8 byte length vs char length, first codepoint",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(
            col("doc_id"),
            octet_length(coalesce(col("text"), lit(""))).cast("long").as("n_bytes"),
            length(coalesce(col("text"), lit(""))).cast("long").as("n_chars_utf"),
            when(col("text").isNull || col("text") === "", lit(-1L))
              .otherwise(ascii(col("text")).cast("long")).as("first_cp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS n_bytes,
             |       CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars_utf,
             |       CAST(CASE WHEN text IS NULL OR text = '' THEN -1
             |                 ELSE unicode(text) END AS BIGINT) AS first_cp
             |FROM documents ORDER BY doc_id""".stripMargin)
    )
  )
}
