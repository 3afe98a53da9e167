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

  /** DuckDB n-gram comprehensions over a list alias `words` — single-sourced
    * because the 1-based index bounds are exactly the kind of arithmetic two
    * hand-maintained copies silently let drift (2-grams: jaccard +
    * repetition; 3-gram shingles: minhash family + decontamination).
    */
  val duckGramsSql =
    "[words[i] || ' ' || words[i+1] for i in range(1, len(words))]"
  val duckShinglesSql =
    "[words[i] || ' ' || words[i+1] || ' ' || words[i+2] for i in range(1, len(words) - 1)]"

  /** Deterministic 60-bit string hash in both dialects — defined next to the
    * Column form in [[graft.functions.Scalars]] (the functions layer owns
    * the construction; queries only consume it).
    */
  def hash60Sql(x: String): String     = graft.functions.Scalars.hexHash60Sql(x)
  def duckHash60Sql(x: String): String = graft.functions.Scalars.duckHexHash60Sql(x)

  /** Integer-quantized embedding (float → round(x*1000) as BIGINT) — the
    * construction that makes every downstream dot product / centroid sum
    * exact integer arithmetic in both engines (shared by the E1e/E1e2 dedup
    * queries and the whole E2 similarity family). Float→double widening is
    * exact and round is half-away-from-zero in both engines.
    */
  val quantSql =
    "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"
  val duckQuantSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
}
