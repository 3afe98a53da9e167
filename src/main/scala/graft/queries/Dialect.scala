package graft.queries

/** SQL fragments shared by the text/dedup query family, in BOTH dialects —
  * one source per construction so the Spark side and its DuckDB oracle twin
  * cannot drift (the same rule [[graft.functions.Scalars.parseBooleanSql]]
  * applies to the boolean chain).
  */
object Dialect {

  /** Word tokens of a document (both engines split trimmed text on runs of
    * spaces).
    */
  val wordsSql     = "split(trim(coalesce(text, '')), ' +')"
  val duckWordsSql = "string_split_regex(trim(coalesce(text, '')), ' +')"

  /** Deterministic 60-bit string hash: first 15 hex chars of md5 parsed
    * base-16 (the SQL rendering of [[graft.functions.Scalars.hexHash60]]).
    * Always non-negative (60 bits < signed 64), exact in both engines.
    */
  def hash60Sql(x: String): String =
    s"cast(conv(substring(md5($x), 1, 15), 16, 10) as bigint)"
  def duckHash60Sql(x: String): String =
    s"('0x' || substr(md5($x), 1, 15))::BIGINT"
}
