package graft

import org.apache.spark.sql.SparkSession

/** One builder for every local entry point (Verify, Bench, Explain, tests):
  * the flags that make results reproducible and oracle-comparable — UTC
  * session time zone, shuffle parallelism = cores, AQE on, and the
  * TIMESTAMP(NANOS) shim for `events.parquet` (see Tables.events).
  */
object LocalSpark {
  def session(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
