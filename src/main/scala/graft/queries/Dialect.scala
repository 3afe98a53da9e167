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

  /** Deterministic 60-bit string hash in both dialects — defined next to the
    * Column form in [[graft.functions.Scalars]] (the functions layer owns
    * the construction; queries only consume it).
    */
  def hash60Sql(x: String): String     = graft.functions.Scalars.hexHash60Sql(x)
  def duckHash60Sql(x: String): String = graft.functions.Scalars.duckHexHash60Sql(x)
}
