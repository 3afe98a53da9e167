package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Scalars

/** Scalar-function surface (SURVEY.md §2.6 X1–X6, P5). Inputs are constructed
  * deterministically from the documents/events tables so that every branch of
  * each reference quirk is exercised (the raw testdata alone wouldn't hit
  * e.g. trailing `*` runs or about-prefixes).
  */
object ScalarQueries {

  /** DuckDB rendering of the parse_boolean CASE chain — the shared builder in
    * [[Scalars.parseBooleanSql]], so every SQL surface uses one source.
    */
  private def parseBooleanSql(in: String): String = Scalars.parseBooleanSql(in)

  val queries: Seq[GraftQuery] = Seq(

    // X1 clean_text (pet_scraper.py:125-132): trailing-star runs + padding.
    GraftQuery(
      "q_clean_text",
      "strip + drop trailing * runs over constructed dirty text",
      (s, dir) => {
        val raw = when(col("doc_id") % 3 === 0, concat(lit("  "), coalesce(col("text"), lit("")), lit("***")))
          .when(col("doc_id") % 3 === 1, concat(coalesce(col("text"), lit("")), lit(" *")))
          .otherwise(col("text"))
        Tables.documents(s, dir)
          .select(col("doc_id"), Scalars.cleanText(raw).as("cleaned"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(trim(coalesce(
             |    CASE WHEN doc_id % 3 = 0 THEN '  ' || coalesce(text,'') || '***'
             |         WHEN doc_id % 3 = 1 THEN coalesce(text,'') || ' *'
             |         ELSE text END, '')), '\*+$', '')) AS cleaned
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // X2 parse_boolean (pet_scraper.py:221-238) over real segment strings:
    // BUILDING/FURNITURE/MACHINERY contain the substring "n" → false (the
    // reference's deliberate quirk); HOUSEHOLD/AUTOMOBILE fall through → true.
    GraftQuery(
      "q_parse_boolean",
      "tri-state boolean parse with substring quirks over c_mktsegment",
      (s, dir) =>
        Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"),
            Scalars.parseBoolean(col("c_mktsegment")).as("parsed"))
          .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey, c_mktsegment, ${parseBooleanSql("c_mktsegment")} AS parsed
              |FROM customer ORDER BY c_custkey""".stripMargin)
    ),

    // X3 extract_name_from_about (pet_scraper.py:241-249): all four branches —
    // exact prefix, case+whitespace variant, prefix-as-substring ("abouts"),
    // and no prefix.
    GraftQuery(
      "q_extract_name",
      "drop leading 'about' marker from constructed about-texts",
      (s, dir) => {
        val t = coalesce(col("text"), lit(""))
        val raw = when(col("doc_id") % 4 === 0, concat(lit("About "), t))
          .when(col("doc_id") % 4 === 1, concat(lit("  ABOUT "), t))
          .when(col("doc_id") % 4 === 2, concat(lit("abouts-"), t))
          .otherwise(t)
        Tables.documents(s, dir)
          .select(col("doc_id"), Scalars.extractNameFromAbout(raw).as("name"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN lower(t) LIKE 'about%' THEN trim(substring(t, 6)) ELSE t END AS name
             |FROM (
             |  SELECT doc_id, trim(coalesce(
             |    CASE WHEN doc_id % 4 = 0 THEN 'About ' || coalesce(text,'')
             |         WHEN doc_id % 4 = 1 THEN '  ABOUT ' || coalesce(text,'')
             |         WHEN doc_id % 4 = 2 THEN 'abouts-' || coalesce(text,'')
             |         ELSE text END, '')) AS t
             |  FROM documents) s
             |ORDER BY doc_id""".stripMargin)
    ),

    // X4 newline escaping (pet_scraper.py:415-417): \r\n → two escapes.
    GraftQuery(
      "q_escape_newlines",
      "escape CR/LF to literal backslash-n, each independently",
      (s, dir) => {
        val t = coalesce(col("text"), lit(""))
        val raw = when(col("doc_id") % 2 === 0, concat(t, lit("\r\n"), lit("tail")))
          .otherwise(concat(t, lit("\n"), lit("tail")))
        Tables.documents(s, dir)
          .select(col("doc_id"), Scalars.escapeNewlines(raw).as("escaped"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  replace(replace(
             |    CASE WHEN doc_id % 2 = 0 THEN coalesce(text,'') || chr(13) || chr(10) || 'tail'
             |         ELSE coalesce(text,'') || chr(10) || 'tail' END,
             |    chr(13), '\n'), chr(10), '\n') AS escaped
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // X5 boolean→string encode (pet_scraper.py:439-443) on a constructed
    // tri-state boolean.
    GraftQuery(
      "q_bool_encode",
      "encode tri-state boolean as True/False/''",
      (s, dir) => {
        val b = when(col("value") > 100, lit(true))
          .when(col("value") > 30, lit(false))
          .otherwise(lit(null).cast("boolean"))
        Tables.events(s, dir)
          .select(col("event_id"), Scalars.encodeBool(b).as("enc"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  CASE WHEN b IS NULL THEN '' WHEN b THEN 'True' ELSE 'False' END AS enc
             |FROM (SELECT event_id,
             |        CASE WHEN value > 100 THEN TRUE WHEN value > 30 THEN FALSE ELSE NULL END AS b
             |      FROM events) t
             |ORDER BY event_id""".stripMargin)
    ),

    // X6 URL normalization (link_scraper.py:136-139): relative vs absolute.
    GraftQuery(
      "q_normalize_url",
      "prefix petfinder base onto relative hrefs",
      (s, dir) => {
        val href = when(col("doc_id") % 2 === 0, concat(lit("/"), col("source")))
          .otherwise(concat(lit("https://example.org/"), col("source")))
        Tables.documents(s, dir)
          .select(col("doc_id"), Scalars.normalizeUrl(href).as("url"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |  CASE WHEN starts_with(href, '/') THEN '${Scalars.PetfinderBase}' || href ELSE href END AS url
              |FROM (SELECT doc_id,
              |        CASE WHEN doc_id % 2 = 0 THEN '/' || source
              |             ELSE 'https://example.org/' || source END AS href
              |      FROM documents) t
              |ORDER BY doc_id""".stripMargin)
    ),

    // P5 positional multi-extract (link_scraper.py:100-145): 12 fixed slots,
    // keep non-empty, slot order preserved (1-based pos).
    GraftQuery(
      "q_posexplode_links",
      "first 12 whitespace tokens per document, position-preserving",
      (s, dir) => {
        val toks = slice(split(trim(coalesce(col("text"), lit(""))), " +"), 1, 12)
        Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(toks).as(Seq("pos0", "tok")))
          .filter(length(col("tok")) > 0)
          .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))
          .orderBy("doc_id", "pos")
      },
      Some("""SELECT doc_id, pos, tok FROM (
             |  SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos, unnest(toks) AS tok
             |  FROM (SELECT doc_id,
             |          list_slice(string_split_regex(trim(coalesce(text,'')), ' +'), 1, 12) AS toks
             |        FROM documents) s) t
             |WHERE length(tok) > 0 ORDER BY doc_id, pos""".stripMargin)
    ),

    // X9 Unicode text normalization, round-tripped: deterministically
    // DIRTY each document (accent substitutions by doc_id class, a NBSP +
    // control-char suffix — real crawl noise), then normalize it back with
    // accent folding (translate), control stripping (regexp), whitespace
    // collapse, and casefold. The only query whose data leaves ASCII: the
    // multibyte_extra column (UTF-8 bytes minus chars of the dirty form)
    // pins that BOTH engines agree on character-vs-byte semantics for
    // 2-byte codepoints end to end through parquet — an encoding-parity
    // gap nothing else in the suite would catch. All row-local, one scan.
    GraftQuery(
      "q_text_normalize",
      "accent-fold + control-strip + space-collapse + casefold, with UTF-8 byte audit",
      (s, dir) => {
        val dirty =
          "concat(case cast(doc_id % 3 as int) " +
            "when 0 then translate(text, 'ae', 'áé') " +
            "when 1 then translate(text, 'ou', 'óü') " +
            "else translate(text, 'n', 'ñ') end, " +
            "'  X', char(9), char(13))"
        val norm =
          "lower(trim(regexp_replace(regexp_replace(" +
            "translate(dirty, 'áéóüñ ', 'aeoun '), " +
            "'[\\\\x00-\\\\x1F]', ''), ' +', ' ')))"
        Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .withColumn("dirty", expr(dirty))
          .withColumn("multibyte_extra",
            expr("cast(octet_length(dirty) - char_length(dirty) as bigint)"))
          .withColumn("norm", expr(norm))
          .select(col("doc_id"), col("multibyte_extra"),
            expr("cast(char_length(norm) as bigint)").as("norm_len"),
            expr("substring(norm, 1, 40)").as("norm_prefix"),
            md5(col("norm")).as("norm_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |         (CASE doc_id % 3
             |            WHEN 0 THEN translate(text, 'ae', 'áé')
             |            WHEN 1 THEN translate(text, 'ou', 'óü')
             |            ELSE translate(text, 'n', 'ñ') END)
             |           || '  X' || chr(9) || chr(13) AS dirty
             |  FROM documents WHERE text IS NOT NULL),
             |n AS (
             |  SELECT doc_id,
             |         CAST(octet_length(encode(dirty)) - length(dirty) AS BIGINT) AS multibyte_extra,
             |         lower(trim(regexp_replace(regexp_replace(
             |           translate(dirty, 'áéóüñ ', 'aeoun '),
             |           '[\x00-\x1F]', '', 'g'), ' +', ' ', 'g'))) AS norm
             |  FROM d)
             |SELECT doc_id, multibyte_extra,
             |       CAST(length(norm) AS BIGINT) AS norm_len,
             |       substring(norm, 1, 40) AS norm_prefix,
             |       md5(norm) AS norm_md5
             |FROM n ORDER BY doc_id""".stripMargin)
    )
  )
}
