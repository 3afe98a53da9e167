package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** Incremental near-dup detection: each batch of NEW documents is checked
  * against the already-indexed corpus WITHOUT reprocessing any old text —
  * the streaming form of the E1b minhash family, and the move that makes
  * dedup affordable at 100 TB (a batch costs O(batch + signature-table),
  * not O(corpus text) — the expensive stages, shingling and the 8-minhash
  * aggregation, run once per document ever).
  *
  * State is a [[KeyedTable]] of signature rows (doc_id, m0..m7, sz) — ~40
  * bytes per document — merged with the table's idempotent batch protocol,
  * so a replayed micro-batch neither duplicates signatures nor re-emits
  * pairs. Candidate generation unions the new batch's band rows with the
  * stored ones and expands pairs only inside capped (band, bh) buckets
  * (the same MaxBucket guard as the batch queries), keeping only pairs that
  * touch at least one new document — stored×stored pairs were already
  * reported by the batches that introduced them.
  *
  * Cap semantics are AS-OF-BATCH, necessarily: the hot-bucket cap sees the
  * bucket's population at processing time, so a bucket that later grows past
  * MaxBucket keeps the pairs it emitted while small (the batch query,
  * seeing the final population, would suppress them all). Equality with the
  * batch pair set therefore holds exactly when no bucket crosses the cap
  * between batches — true of real corpora (the cap exists for degenerate
  * boilerplate buckets, which are degenerate from the start) and asserted
  * by the parity spec on the test corpus.
  *
  * Documented next knob at scale: persist band rows bucketed by `bh`
  * alongside the signatures, so a batch joins only the buckets it hashes
  * into instead of re-deriving the 4 md5s per stored signature (a
  * signature-table scan per batch; cheap, but not free).
  */
object IncrementalDedup {

  /** (doc_id, m0..m7, sz) minhash signatures of raw (doc_id, text) rows. */
  def signaturesOf(docs: DataFrame): DataFrame =
    DedupQueries.signatures(DedupQueries.shingleRows(docs))

  /** Index `docs` (doc_id, text, ...) under `batchId` and return the near-dup
    * candidate pairs (a, b) this batch creates against the corpus-so-far
    * (including within-batch pairs); `is_new_b` marks within-batch pairs.
    * Replay-safe: an already-applied batchId returns no pairs and leaves the
    * table untouched.
    */
  def processBatch(table: KeyedTable, docs: DataFrame, batchId: Long): DataFrame = {
    val sig = signaturesOf(docs)
    if (table.alreadyApplied(batchId))
      return sig.select(col("doc_id").as("a"), col("doc_id").as("b"),
        lit(false).as("is_new_b")).limit(0)
    val newBands = DedupQueries.bandRows(sig)
      .withColumn("is_new", lit(true))
    val stored = table.read()
      .map(s => DedupQueries.bandRows(s).withColumn("is_new", lit(false)))
    val allBands = stored.fold(newBands)(newBands.unionByName(_))
    val pairs = allBands
      // one row per (bucket, doc): a re-indexed doc appears with BOTH tags
      // and must not count twice toward the bucket cap
      .groupBy(col("band"), col("bh"), col("doc_id"))
      .agg(max(col("is_new")).as("is_new"))
      .groupBy("band", "bh")
      .agg(array_sort(collect_set(struct(col("doc_id"), col("is_new")))).as("ms"))
      .filter(size(col("ms")).between(2, DedupQueries.MaxBucket))
      .select(explode(expr(DedupQueries.pairExpansionSql("ms")((x, y) =>
        s"named_struct('a', $x.doc_id, 'an', $x.is_new, 'b', $y.doc_id, 'bn', $y.is_new)"))).as("p"))
      // a == b can only mean a re-indexed doc colliding with its own stored
      // signature — not a near-dup pair
      .filter(col("p.a") =!= col("p.b"))
      .filter(col("p.an") || col("p.bn"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg((max(col("p.an")) && max(col("p.bn"))).as("is_new_b"))
      .persist()
    // materialize BEFORE the merge: `pairs` lazily reads the pre-merge
    // snapshot, which later merges (and snapshot GC) may delete
    pairs.count()
    table.merge(sig, batchId)
    pairs
  }
}
