package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expressions.DotProductLong.dotLong
import graft.queries.{Dialect, SimilarityQueries => SQ}

/** Persisted IVF ANN index — the SERVED form of the graded `q_ann_ivf` scan
  * (which recomputes assignment per query): [[build]] trains the codebook
  * (the same deterministic 2-Lloyd-iteration fit), assigns every vector
  * once, and writes the corpus PARTITIONED BY inverted-list id; [[search]]
  * then reads ONLY the NProbe list partitions each probe hashes into
  * (partition pruning, pinned by the spec) — at 100 TB a query touches a
  * constant number of list directories, never the corpus. The same
  * store-partitioned-by-derived-key move as the incremental-dedup band
  * index; the index is derived data over the embeddings table, rebuilt by
  * re-running [[build]].
  *
  * Layout: `<dir>/vectors/cid=<list>/` (vec_id, q, n2 per row) and
  * `<dir>/codebook/` ((cid, cq) — k rows, read to the driver at search
  * time so probe-side dots are literal expressions, same as the graded
  * query).
  */
object AnnIndex {

  private def vectorsPath(dir: String)  = dir + "/vectors"
  private def codebookPath(dir: String) = dir + "/codebook"

  /** (vec_id, q, n2) — the quantized, norm-filtered corpus projection the
    * whole E2 family scans (well-formed vectors only).
    */
  private def corpus(s: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(s, sfDir)
      .filter(size(col("embedding")) === SQ.Dim)
      .withColumn("q", expr(Dialect.quantSql))
      .withColumn("n2", dotLong(col("q"), col("q")))
      .filter(col("n2") > 0)
      .select("vec_id", "q", "n2")

  /** Train (2 fixed Lloyd iterations from the deterministic seeds), assign,
    * and write the index under `indexDir`.
    */
  def build(s: SparkSession, sfDir: String, indexDir: String): Unit = {
    val cents = SQ.trainCodebook(s, sfDir)
    corpus(s, sfDir)
      .withColumn("cid", SQ.cidColOf(cents.map(_._2)))
      .write.mode("overwrite")
      .partitionBy("cid")
      .parquet(vectorsPath(indexDir))
    import s.implicits._
    cents.toDF("cid", "cq")
      .coalesce(1).write.mode("overwrite").parquet(codebookPath(indexDir))
  }

  /** Top-3 cosine neighbors for `probes` (vec_id, q, n2 — the external query
    * workload) against the stored index: each probe explodes its NProbe
    * nearest list ids, the scan is pruned to exactly those `cid=` partitions,
    * and scoring is exact within the lists. Output matches `q_ann_ivf`
    * row-for-row when probes and corpus come from the same table.
    */
  /** The stored codebook, sorted by cid (index order = id order). */
  private def codebook(s: SparkSession, indexDir: String): Seq[Seq[Long]] =
    s.read.parquet(codebookPath(indexDir))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1)))
      .sortBy(_._1).map(_._2).toSeq

  /** Probe rows exploded to their NProbe nearest list ids. */
  private def probeCidsOf(probes: DataFrame, cents: Seq[Seq[Long]]): DataFrame =
    probes
      .withColumn("dots", SQ.dotsColOf(cents))
      .select(col("vec_id").as("qid"), col("q").as("qq"),
        col("n2").as("qn"), explode(SQ.probeCidsCol).as("cid"))

  /** The list ids a probe workload touches — the pruning predicate
    * (≤ probes × NProbe ints, a bounded collect).
    */
  private[graft] def touchedLists(s: SparkSession, indexDir: String, probes: DataFrame): Seq[Int] =
    probeCidsOf(probes, codebook(s, indexDir))
      .select("cid").distinct().collect().map(_.getInt(0)).toSeq

  /** The pruned index scan: only the `cid=` partitions in `touched` are
    * listed and read.
    */
  private[graft] def listScan(s: SparkSession, indexDir: String, touched: Seq[Int]): DataFrame =
    s.read.parquet(vectorsPath(indexDir))
      .filter(col("cid").isin(touched: _*))

  /** The exact-scoring tail both indexes share: per-probe cosine over the
    * candidate rows, top-3 by (cos desc, id asc), the graded output shape.
    * One source — a tie-break or rounding change must move BOTH indexes and
    * their graded twins together.
    */
  private def scoreTop3(candidates: DataFrame): DataFrame =
    candidates
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotLong(col("qq"), col("q")).cast("double") /
        (sqrt(col("qn").cast("double")) * sqrt(col("n2").cast("double"))))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor"), round(col("cos"), 4).as("cos_r"))
      .orderBy("qid", "rank")

  def search(s: SparkSession, indexDir: String, probes: DataFrame): DataFrame = {
    val cents = codebook(s, indexDir)
    // persisted: the touched-list collect AND the join both evaluate this
    // lineage (which may carry an expensive external probe pipeline); the
    // caller unpersists via catalog cache eviction (family discipline)
    val probeCids = probeCidsOf(probes, cents).persist()
    val touched   = probeCids.select("cid").distinct().collect().map(_.getInt(0)).toSeq
    scoreTop3(listScan(s, indexDir, touched).join(probeCids, "cid"))
  }

  /** The graded probe workload (fixed literal ids) as a search input. */
  def probeWorkload(s: SparkSession, sfDir: String): DataFrame =
    corpus(s, sfDir).filter(col("vec_id").isin(SQ.ProbeIds: _*))

  // ---------------------------------------------------------------------
  // Persisted LSH index — the SERVED form of the graded `q_ann_lsh` scan,
  // and the third instance of the store-partitioned-by-derived-key pattern
  // (IVF lists above, IncrementalDedup band buckets). buildLsh bucketizes
  // every vector with the graded NTables×BitsPerTable sign-bit construction
  // and writes one row PER TABLE partitioned by the composite key
  // pb = t·2^bits + bucket (the L-fold copy is inherent to multi-table LSH —
  // disk trades for the OR-amplified recall); searchLsh expands each
  // probe's Hamming-1 multi-probe set and prunes the scan to exactly those
  // pb partitions — a probe touches NTables·(1+BitsPerTable) of the
  // NTables·2^bits directories no matter how large the corpus grows.
  // ---------------------------------------------------------------------

  private def lshPath(dir: String) = dir + "/lsh"

  private val BucketSpan = 1L << SQ.BitsPerTable

  /** (vec_id, q, n2, t, bucket, pb) — one row per (vector, table). */
  private def lshRows(vectors: DataFrame): DataFrame =
    vectors
      .withColumn("bs", SQ.bucketsCol)
      .select(col("vec_id"), col("q"), col("n2"),
        posexplode(col("bs")).as(Seq("t", "bucket")))
      .withColumn("pb", col("t") * BucketSpan + col("bucket"))

  def buildLsh(s: SparkSession, sfDir: String, indexDir: String): Unit =
    lshRows(corpus(s, sfDir))
      .write.mode("overwrite")
      .partitionBy("pb")
      .parquet(lshPath(indexDir))

  /** Each probe exploded to its Hamming-1 multi-probe (t, bucket) set —
    * the own bucket plus every single-bit flip, as in the graded query.
    */
  private def probeBuckets(probes: DataFrame): DataFrame = {
    val masks = lit(0L) +: (0 until SQ.BitsPerTable).map(i => lit(1L << i))
    lshRows(probes)
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n2").as("qn"),
        col("t"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(m)): _*)).as("bucket"))
      .withColumn("pb", col("t") * BucketSpan + col("bucket"))
  }

  /** The pb partitions a probe workload touches — bounded by
    * probes × NTables × (1 + BitsPerTable), never the corpus.
    */
  private[graft] def touchedBuckets(probes: DataFrame): Seq[Long] =
    probeBuckets(probes).select("pb").distinct().collect().map(_.getLong(0)).toSeq

  /** The pruned bucket scan: only the `pb=` partitions in `touched`. */
  private[graft] def bucketScan(s: SparkSession, indexDir: String, touched: Seq[Long]): DataFrame =
    s.read.parquet(lshPath(indexDir))
      .filter(col("pb").isin(touched: _*))

  /** Top-3 cosine neighbors against the stored LSH index — matches
    * `q_ann_lsh` row-for-row when probes and corpus come from the same
    * table (candidates OR across tables, scored once, exact within bucket).
    */
  def searchLsh(s: SparkSession, indexDir: String, probes: DataFrame): DataFrame = {
    // persisted for the same collect+join double evaluation as search
    val pb      = probeBuckets(probes).persist()
    val touched = pb.select("pb").distinct().collect().map(_.getLong(0)).toSeq
    scoreTop3(
      bucketScan(s, indexDir, touched)
        .select("pb", "vec_id", "q", "n2")
        .join(pb.select("pb", "qid", "qq", "qn"), "pb")
        .dropDuplicates("qid", "vec_id")) // OR across tables, score once
  }
}
