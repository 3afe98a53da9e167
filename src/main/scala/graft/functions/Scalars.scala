package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType}

/** Scalar column functions reproducing the reference's per-field transforms
  * (SURVEY.md §2.6). All are pure `Column => Column` compositions of built-in
  * (whole-stage-codegen'd) expressions — no UDFs, so Catalyst can constant-fold
  * and push them, and DuckDB-oracle parity stays a matter of writing the same
  * CASE chain in SQL.
  */
object Scalars {

  /** X1 `clean_text` — /root/reference/pet_scraper.py:125-132.
    * strip → drop trailing `*` runs → strip; falsy input → "".
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(trim(coalesce(c, lit(""))), "\\*+$", ""))

  /** X2 `parse_boolean` — /root/reference/pet_scraper.py:221-238, called as
    * `parse_boolean(text) if text else None` (pet_scraper.py:305-322).
    *
    * Quirks preserved deliberately (SURVEY.md §7.4#5):
    *  - negative indicators checked BEFORE positive ones;
    *  - indicators are SUBSTRING matches, so "n" makes e.g. "unknown" false;
    *  - only null / "" map to null (tri-state); whitespace-only → false
    *    (truthy raw string, but `bool("".strip())` is false).
    */
  val NegativeIndicators: Seq[String] = Seq("no", "false", "✗", "unchecked", "n")
  val PositiveIndicators: Seq[String] = Seq("yes", "true", "✓", "check", "checked", "y")

  def parseBoolean(c: Column): Column = {
    val t   = trim(lower(c))
    val neg = NegativeIndicators.map(s => t.contains(lit(s))).reduce(_ || _)
    val pos = PositiveIndicators.map(s => t.contains(lit(s))).reduce(_ || _)
    when(c.isNull || c === lit(""), lit(null).cast(BooleanType))
      .when(neg, lit(false))
      .when(pos, lit(true))
      .otherwise(length(t) > lit(0))
  }

  /** X3 `extract_name_from_about` — /root/reference/pet_scraper.py:241-249.
    * strip; if lowercased text starts with "about", drop the first 5 chars;
    * strip again.
    */
  def extractNameFromAbout(c: Column): Column = {
    val t = trim(coalesce(c, lit("")))
    when(lower(t).startsWith("about"), trim(t.substr(lit(6), length(t))))
      .otherwise(t)
  }

  /** X4 newline escaping — /root/reference/pet_scraper.py:415-417.
    * EACH of `\r`, `\n` independently becomes the two-char literal `\n`
    * (so a `\r\n` pair becomes two escapes).
    */
  def escapeNewlines(c: Column): Column =
    regexp_replace(c, "[\\r\\n]", "\\\\n")

  /** X5 boolean→string encode — /root/reference/pet_scraper.py:439-443.
    * true→"True", false→"False", null→"".
    */
  def encodeBool(c: Column): Column =
    when(c.isNull, lit("")).when(c, lit("True")).otherwise(lit("False"))

  /** X6 URL normalization — /root/reference/link_scraper.py:136-139. */
  val PetfinderBase = "https://www.petfinder.com"
  def normalizeUrl(c: Column): Column =
    when(c.startsWith("/"), concat(lit(PetfinderBase), c)).otherwise(c)

  /** X7 lower+trim normalization (pet_scraper.py:375, server.py:83). */
  def lowerTrim(c: Column): Column = lower(trim(c))

  /** The parse_boolean CASE chain as SQL text over input expression `in` —
    * the ONE source for every SQL surface that needs X2's quirky semantics
    * (DuckDB oracle twins, registered SQL function). Valid in both Spark SQL
    * and DuckDB (CASE/contains/trim/lower/length are shared).
    */
  def parseBooleanSql(in: String): String = {
    val t   = s"trim(lower($in))"
    val neg = NegativeIndicators.map(s => s"contains($t, '$s')").mkString(" OR ")
    val pos = PositiveIndicators.map(s => s"contains($t, '$s')").mkString(" OR ")
    s"""CASE WHEN $in IS NULL OR $in = '' THEN CAST(NULL AS BOOLEAN)
       |     WHEN $neg THEN FALSE
       |     WHEN $pos THEN TRUE
       |     ELSE length($t) > 0 END""".stripMargin
  }

  /** Deterministic 60-bit string hash shared with the DuckDB oracle:
    * first 15 hex chars of md5 parsed as base-16. Both engines agree exactly
    * (DuckDB: `('0x' || substr(md5(x),1,15))::BIGINT`). Used by the dedup /
    * fingerprint operators where Spark's xxhash64 has no DuckDB twin.
    * Always non-negative (60 bits < signed 64). Computed by the native
    * [[graft.expressions.Md5Hash60]] expression — identical values to the
    * composed `conv(substring(md5(x), 1, 15), 16, 10)` spelling (pinned by
    * Md5Hash60Spec) without its three per-value string round-trips: this
    * hash runs once per shingle on the dedup family's hottest path.
    */
  def hexHash60(c: Column): Column = graft.expressions.Md5Hash60.md5Hash60(c)

  /** [[hexHash60]] as Spark SQL text (for `expr(...)` call sites and the
    * registered SQL function — every graft session registers `md5_hash60`
    * via [[graft.GraftExtensions]]).
    */
  def hexHash60Sql(in: String): String = s"md5_hash60($in)"

  /** The DuckDB rendering of the same construction, for oracle twins. */
  def duckHexHash60Sql(in: String): String =
    s"('0x' || substr(md5($in), 1, 15))::BIGINT"

  /** "Missing" in the reference means null OR blank after trim
    * (pet_scraper.py:387-405; SURVEY.md §7.4#6). Works on any type by
    * casting through string.
    */
  def isMissing(c: Column): Column =
    c.isNull || trim(c.cast("string")) === lit("")

  /** Horizontal count of missing fields (A2 — pet_scraper.py:387-404). */
  def missingCount(fields: Seq[Column]): Column =
    fields.map(f => when(isMissing(f), lit(1)).otherwise(lit(0))).reduce(_ + _)
}
