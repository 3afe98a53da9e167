package graft.tools


import graft.SparkEntry

/** Dev tool: dump `explain("formatted")` for the queries named on the command
  * line (or a default heavy set) at the given scale dir — the plan-review
  * loop SURVEY.md §7.4#8 asks for after every operator lands.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_dedup_minhash", "q_ngram_jaccard", "q_cosine_topk", "q_ann_lsh",
      "q_upsert_merge", "q_pagination_window", "q_sessionize",
      "q_dup_clusters", "q_dup_span_coverage", "q_source_overlap")
    val spark = graft.LocalSpark.session("4", "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
