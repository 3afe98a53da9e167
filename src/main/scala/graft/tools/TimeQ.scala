package graft.tools

/** Dev tool: wall-time the queries named on the command line at
  * `SPARK_GRAFT_SF_DIR` (twice each — rep1 carries codegen/scan warm-up,
  * rep2 is the comparable number), forcing full evaluation through the
  * bench's own hash fold so the timed work is identical to `graft.Bench`'s.
  * `GRAFT_TIMEQ_CAPTURE=1` runs each repeat under a [[graft.Phases]]
  * capture — the bench's dedicated diagnostic-evaluation condition (its
  * timed repeats are capture-free) — and prints the phase split, so a
  * composite's capture-mode cost is A/B-able against its plain lazy plan
  * from the same JVM.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val capture = sys.env.get("GRAFT_TIMEQ_CAPTURE").exists(v => v.nonEmpty && v != "0")
    val spark = graft.LocalSpark.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "timeq")
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.toSeq; rep <- 1 to 2) {
      graft.Bench.clearAllCaches(spark)
      val t0 = System.nanoTime()
      def force() = graft.Bench.forceFrame(graft.SparkEntry.queries(q)(spark, sfDir))
      val phases = if (capture) graft.Phases.capture(force())._2 else { force(); Nil }
      val split = if (phases.isEmpty) ""
        else phases.map { case (p, v) => f" $p=$v%.2f" }.mkString(" |")
      println(f"$q rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s$split")
    }
    spark.stop()
  }
}
