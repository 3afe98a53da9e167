package graft.tools

/** Dev tool: evaluate every graded query once (at `SPARK_GRAFT_SF_DIR`,
  * default sf0.001), clear the SQL cache the way the runners do, and report
  * any PERSISTENT RDDS LEFT BEHIND — `Dataset.persist` residue is freed by
  * `clearCache`, but raw-RDD persists (`Lineage.materialize`, eager/lazy
  * `localCheckpoint`s) are not, and each leaked block set degrades every
  * later query in a long single-JVM run (the bench measured 2.4× uniform
  * inflation from exactly this).
  */
object StorageAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.LocalSpark.session("8", "storage-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      try graft.Bench.forceFrame(graft.SparkEntry.queries(name)(spark, sfDir))
      catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage.take(120)}") }
      spark.catalog.clearCache()
      val left = spark.sparkContext.getPersistentRDDs
      if (left.nonEmpty)
        println(s"$name leaks ${left.size} rdds: " +
          left.values.map(r => s"id=${r.id} ${r.getStorageLevel.description}").mkString("; "))
    }
    spark.stop()
  }
}
