package graft

import org.apache.spark.sql.functions.col

/** Pins for two ADVICE-r9 fixes that had no direct spec:
  *
  *  - [[Tables.spread]]'s split-count memo keys on file LENGTHS (not just
  *    names), so a table rewritten in place under the same file names gets
  *    a fresh planning pass instead of a stale split count;
  *  - [[graft.queries.EventQueries.anomalyReport]]'s driver-side local
  *    relation is gated by a row ceiling, and the overflow (lazy) path
  *    computes the identical report.
  */
class SpreadMemoSpec extends SparkTestBase {

  test("spread re-plans a table rewritten in place under the same file names") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spread_memo").toString
    val slots = spark.sparkContext.defaultParallelism
    // ONE small file: far under slots/4 splits, so spread injects the
    // round-robin repartition to `slots`
    (1 to 100).toDF("x").coalesce(1).write.mode("overwrite").parquet(dir)
    val before = Tables.spread(spark.read.parquet(dir)).rdd.getNumPartitions
    assert(before == slots, s"single-split scan must spread to $slots, got $before")
    // rewrite IN PLACE with many files under the same directory (overwrite
    // keeps the path identical; part file names may or may not collide —
    // the memo key must not care because lengths/sets change)
    (1 to 100000).toDF("x").repartition(slots).write.mode("overwrite").parquet(dir)
    val files = spark.read.parquet(dir).inputFiles.length
    assert(files * 4 > slots, s"rewrite must have many files, got $files")
    val after = Tables.spread(spark.read.parquet(dir)).rdd.getNumPartitions
    // a stale memo would still report 1 split and wrap the multi-split
    // scan in a useless repartition-to-slots; the fresh key must let the
    // scan through unchanged (spread is a no-op at >= slots/4 splits)
    val raw = spark.read.parquet(dir).rdd.getNumPartitions
    assert(after == raw,
      s"spread must be a no-op on the rewritten multi-split table ($after vs raw $raw)")
  }

  test("anomalyReport's overflow (lazy) path equals the local-relation path") {
    import graft.queries.EventQueries
    val cnt = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), org.apache.spark.sql.functions.expr(
        "unix_micros(ts) div 3600000000").as("hr"))
      .groupBy("event_type", "hr")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
    def rows(ceiling: Int) =
      EventQueries.anomalyReport(cnt, ceiling).collect().map(_.toSeq).toSeq
    val local = rows(1000000) // far above the grid: local-relation path
    val lazyP = rows(1)       // forced overflow: fully lazy plan
    assert(local.nonEmpty, "fixture must produce anomalies")
    assert(local == lazyP, "ceiling overflow path diverged from the local path")
  }
}
