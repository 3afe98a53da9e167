package graft.tools

/** Dev tool: wall-time the queries named on the command line at
  * `SPARK_GRAFT_SF_DIR` (twice each — rep1 carries codegen/scan warm-up,
  * rep2 is the comparable number), forcing full evaluation through the
  * bench's own hash fold so the timed work is identical to `graft.Bench`'s.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSpark.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "timeq")
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.toSeq; rep <- 1 to 2) {
      graft.Bench.clearAllCaches(spark)
      val t0 = System.nanoTime()
      graft.Bench.forceFrame(graft.SparkEntry.queries(q)(spark, sfDir))
      println(f"$q rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
