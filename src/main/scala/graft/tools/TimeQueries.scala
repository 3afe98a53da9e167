package graft.tools

import graft.SparkEntry

/** Dev tool: warm-up + timed run of just the queries named on argv (default:
  * the current bench heavy hitters), with the same force-every-column
  * evaluation Bench uses. Keeps perf iteration on one query from paying the
  * full 52-query bench.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_minhash_verified", "q_ngram_jaccard")
    val spark = graft.LocalSpark.session(cpus, "graft-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    def force(name: String): Unit =
      graft.Bench.forceFrame(SparkEntry.queries(name)(spark, sfDir))
    names.foreach(force)
    names.foreach { n =>
      spark.catalog.clearCache() // same cross-query cache rule as Bench
      val t0 = System.nanoTime()
      // split construction (driver loops like CC/BPE run jobs HERE) from
      // the final evaluation, so a slow query points at the right phase
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      graft.Bench.forceFrame(df)
      val t2 = System.nanoTime()
      println(f"$n%-24s ${(t2 - t0) / 1e9}%.2f s " +
        f"(construct ${(t1 - t0) / 1e9}%.2f, eval ${(t2 - t1) / 1e9}%.2f)")
    }
    spark.stop()
  }
}
