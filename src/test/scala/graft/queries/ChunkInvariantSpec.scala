package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Structural invariants of `q_chunk_windows` the row-wise oracle hash can't
  * state directly: per document, the emitted windows must TILE the token
  * range — start at 0, advance by exactly the stride, end at the doc's token
  * count, and never emit an empty window. A stride/window off-by-one leaves
  * tokens uncovered (silently dropping corpus from the embedder) or emits
  * phantom empty chunks; either breaks here with a named message.
  */
class ChunkInvariantSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val S   = TextQueries.ChunkS

  test("chunks tile each document: start 0, stride steps, cover to n, never empty") {
    val chunks = SparkEntry.queries("q_chunk_windows")(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr(s"cast(size(${Dialect.wordsSql}) as bigint)").as("n"))
    val bad = chunks
      .groupBy("doc_id")
      .agg(
        min(col("chunk_start")).as("first_start"),
        max(col("chunk_end")).as("last_end"),
        count(lit(1)).as("n_chunks"),
        max(col("chunk_start") - col("chunk_id") * lit(S)).as("stride_drift"),
        min(col("n_tokens")).as("min_tokens"),
        max(when(col("chunk_end") - col("chunk_start") =!= col("n_tokens"), 1L)
          .otherwise(0L)).as("len_mismatch"))
      .join(docs, "doc_id")
      .filter(
        col("first_start") =!= 0L ||
        col("last_end") =!= col("n") ||
        col("stride_drift") =!= 0L ||
        col("min_tokens") <= 0L ||
        col("len_mismatch") =!= 0L ||
        // every token position below n must sit inside some chunk's
        // stride: exactly ceil(n / stride) windows, no more, no fewer
        col("n_chunks") =!= expr(s"(n + ${S - 1}) div $S"))
      .count()
    assert(bad == 0L, s"$bad documents violate the chunk tiling invariants")
  }
}
