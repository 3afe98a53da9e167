package graft

import org.apache.spark.sql.SparkSession

/** One builder for every local entry point (Verify, Bench, Explain, tests):
  * the flags that make results reproducible and oracle-comparable — UTC
  * session time zone, shuffle parallelism = cores, AQE on, the
  * TIMESTAMP(NANOS) shim for `events.parquet` (see Tables.events), and the
  * engine's session extensions, so `dot_long` and the §2.10 scalar names are
  * SQL-visible in every entry point without a manual register call (a
  * cluster deployment gets the same via
  * `--conf spark.sql.extensions=graft.GraftExtensions`).
  */
object LocalSpark {
  def session(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // getOrCreate may return a pre-existing session the extensions config
    // never reached (extensions only apply at session BUILD time); register
    // directly too — both paths are idempotent. This also covers the UDF
    // names, which extensions can't inject.
    GraftExtensions.register(s)
    s
  }
}
