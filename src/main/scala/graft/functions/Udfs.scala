package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-name registration sugar for the scalar layer (SURVEY.md §2.10): makes
  * the X1–X6 semantics callable from `spark.sql(...)` strings as
  * `clean_text(c)`, `parse_boolean(c)`, … — API parity for users who drive
  * the engine through SQL rather than the Column DSL.
  *
  * Implemented as Spark SQL UDFs (`CREATE FUNCTION … RETURN <expr>`), NOT
  * row-at-a-time lambda UDFs: the analyzer inlines the body expression into
  * the calling plan, so whole-stage codegen, constant folding, and pushdown
  * all still apply. UdfsSpec pins each SQL body to its Column-DSL twin in
  * [[Scalars]] so the two surfaces cannot drift.
  */
object Udfs {

  /** name → (typed parameter list, return type, body) — bodies mirror
    * [[Scalars]] exactly (same indicator ordering, same quirks).
    */
  private val defs: Seq[(String, String, String, String)] = Seq(
    ("clean_text", "s STRING", "STRING",
      "trim(regexp_replace(trim(coalesce(s, '')), '\\\\*+$', ''))"),
    ("parse_boolean", "s STRING", "BOOLEAN", Scalars.parseBooleanSql("s")),
    ("extract_name_from_about", "s STRING", "STRING",
      """CASE WHEN lower(trim(coalesce(s, ''))) LIKE 'about%'
        |     THEN trim(substring(trim(coalesce(s, '')), 6))
        |     ELSE trim(coalesce(s, '')) END""".stripMargin),
    ("escape_newlines", "s STRING", "STRING",
      "replace(replace(s, '\\r', '\\\\n'), '\\n', '\\\\n')"),
    ("encode_bool", "b BOOLEAN", "STRING",
      "CASE WHEN b IS NULL THEN '' WHEN b THEN 'True' ELSE 'False' END"),
    ("normalize_url", "s STRING", "STRING",
      s"CASE WHEN s LIKE '/%' THEN '${Scalars.PetfinderBase}' || s ELSE s END"),
    ("hex_hash60", "s STRING", "BIGINT", Scalars.hexHash60Sql("s")))

  /** All registered names, for discovery/tests. */
  val names: Seq[String] = defs.map(_._1)

  def register(spark: SparkSession): Unit =
    defs.foreach { case (name, params, ret, body) =>
      spark.sql(
        s"CREATE OR REPLACE TEMPORARY FUNCTION $name($params) RETURNS $ret RETURN $body")
    }
}
