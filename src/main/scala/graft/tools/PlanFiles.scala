package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write `explain("formatted")` of each named query to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit (guide §1: capture the plan shape for every
  * query you touch). Usage: PlanFiles <tag> <suffix> <query...>; reads
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` like the bench so the dumped
  * plan is the bench's plan.
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.LocalSpark.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "plan-files")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans", tag)
    Files.createDirectories(dir)
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${q}_$suffix.txt"), txt)
      println(s"wrote ${dir.resolve(s"${q}_$suffix.txt")}")
    }
    spark.stop()
  }
}
