package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure how the heavy graded pipelines SCALE, not just how fast
  * they are at one size. Replicates the sf dir's `documents` and `lineitem`
  * tables at 2× and 4× (ids offset per replica so keys stay unique; text is
  * repeated verbatim, which stresses the dedup paths' hot-bucket caps exactly
  * the way near-duplicate-heavy corpora do at 100 TB), then times a
  * representative query set through the unchanged graded code path at each
  * scale. Output: one JSON line per (query, scale) with seconds and rows —
  * a pipeline whose time grows super-linearly here has a stage that will not
  * survive the next 100×.
  *
  * Replicas live under /tmp (derived scratch data; the read-only testdata is
  * never touched).
  */
object ScaleSmoke {

  private val DefaultScales = Seq(1, 2, 4)
  private val Queries = Seq(
    "q_scan_project",      // pushdown + projection: must scale with bytes read
    "q_token_quantiles",   // histogram + cumulative window: vocabulary-bound tail
    "q_dedup_minhash",     // shingle→signature→banded buckets: cap-bound pairs
    "q_ngram_jaccard",     // set-similarity join: df-cap must hold under dup inflation
    "q_dup_span_coverage", // positional shingles + islands merge: window-heavy
    "q_bloom_decontaminate") // bloom prefilter: bits stay <= m as bench grows

  /** Offset keys so replicas do not collide; every other column repeats. */
  private def replicate(spark: SparkSession, base: String, dir: String, r: Int): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until r).map(i => docs.withColumn("doc_id", col("doc_id") + lit(i * 100000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    (0 until r).map(i => li.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base   = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out    = "/tmp/scale_smoke"
    val scales = if (args.nonEmpty) args.toSeq.map(_.toInt) else DefaultScales
    require(scales.forall(_ >= 1), s"replication factors must be >= 1, got: ${scales.mkString(" ")}")
    val spark = graft.LocalSpark.session("32", "graft-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    val dirs: Map[Int, String] = scales.map { r =>
      if (r == 1) r -> base
      else {
        val dir = s"$out/x$r"
        replicate(spark, base, dir, r)
        r -> dir
      }
    }.toMap

    for (q <- Queries) {
      // per-query warm-up at base scale absorbs planning/codegen cost, so the
      // timed runs measure data work only (otherwise scale 1, always timed
      // first, eats each query's one-time codegen and the curve reads flat)
      spark.catalog.clearCache()
      graft.SparkEntry.queries(q)(spark, base).count()
      for (r <- scales) {
        spark.catalog.clearCache()
        val t0   = System.nanoTime()
        val rows = graft.SparkEntry.queries(q)(spark, dirs(r)).count()
        // Locale.ROOT: the f-interpolator follows the JVM default locale,
        // and a comma decimal separator would emit invalid JSON
        val sec = String.format(java.util.Locale.ROOT, "%.2f",
          Double.box((System.nanoTime() - t0) / 1e9))
        println(s"""{"query":"$q","scale":$r,"sec":$sec,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}
