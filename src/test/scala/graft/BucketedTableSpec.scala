package graft

import org.apache.spark.sql.functions.col

import graft.operators.Relational
import graft.streaming.KeyedTable

/** The bucketed KeyedTable variant (SURVEY §7.5 scale knob; VERDICT r3
  * next-step #4): merge semantics identical to the plain table, but the
  * snapshot side of the upsert join must arrive pre-partitioned from the
  * bucketed scan — no Exchange — with only the micro-batch side shuffling.
  */
class BucketedTableSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("bucketed merge keeps upsert semantics across batches and replays") {
    val kt = new KeyedTable(spark, tmp("bkt-sem"), "k", buckets = Some(8))
    kt.merge(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), batchId = 0L)
    kt.merge(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), batchId = 1L)
    kt.merge(Seq((3L, "CLOBBER")).toDF("k", "v"), batchId = 1L) // replay: skipped
    val out = kt.read().get.orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("the merge join does not shuffle the snapshot side (bucketed scan)") {
    val kt = new KeyedTable(spark, tmp("bkt-plan"), "k", buckets = Some(8))
    kt.merge((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), batchId = 0L)

    // broadcast off, so the join must be the shuffle-sensitive sort-merge
    // path — the exact plan whose snapshot-side Exchange this knob deletes
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val updates = Seq((1L, "A"), (200L, "new")).toDF("k", "v")
      val merged  = Relational.upsertMerge(kt.read().get, updates, "k")
      val plan    = merged.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"snapshot side not read as a bucketed scan:\n$plan")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles == 1,
        s"expected exactly 1 shuffle (micro-batch side only), got $shuffles:\n$plan")
      // and the plan still computes the right answer
      val out = merged.orderBy("k").as[(Long, String)].collect()
      assert(out.length == 101 && out(0) == ((1L, "A")) && out(100) == ((200L, "new")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("streaming ingest drives a bucketed table end-to-end (checkpointed foreachBatch merge)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val srcDir, ckptDir = tmp("bkt-stream")
    val kt = new KeyedTable(spark, tmp("bkt-stream-table"), "link", buckets = Some(4))
    val schema = StructType(Seq(
      StructField("link", StringType), StructField("name", StringType),
      StructField("seq", LongType)))
    def writeBatch(rows: Seq[(String, String, Long)]): Unit =
      rows.toDF("link", "name", "seq").coalesce(1).write.mode("append").parquet(srcDir)
    def drain(): Unit = {
      val q = graft.streaming.Ingest.start(
        spark.readStream.schema(schema).parquet(srcDir), kt, ckptDir,
        valid = col("name").isNotNull, seqCol = Some("seq"),
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    writeBatch(Seq(("a", "1", 1L), ("b", "2", 1L)))
    drain()
    writeBatch(Seq(("b", "2B", 2L), ("c", "3", 1L)))
    drain()
    val out = kt.read().get.select("link", "name")
      .orderBy("link").as[(String, String)].collect().toSeq
    assert(out == Seq(("a", "1"), ("b", "2B"), ("c", "3")))
  }

  test("read falls back to plain parquet when catalog metadata is gone (restart)") {
    // bucket metadata is catalog-scoped: a new session after restart has the
    // files but not the table entry — read must degrade to a parquet scan,
    // and the next publish re-registers the bucketing
    val dir = tmp("bkt-restart")
    val kt  = new KeyedTable(spark, dir, "k", buckets = Some(4))
    kt.merge(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), batchId = 0L)
    val md     = java.security.MessageDigest.getInstance("MD5")
    val prefix = "graft_kt_" +
      md.digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    // simulate the restart by dropping the catalog entries (files stay)
    spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(prefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    assert(kt.read().get.count() == 2, "parquet fallback must still serve the snapshot")
    kt.merge(Seq((3L, "c")).toDF("k", "v"), batchId = 1L)
    assert(spark.catalog.tableExists(s"${prefix}_v1"),
      "next publish must re-register the bucketed table")
    assert(kt.read().get.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("snapshot GC drops superseded catalog entries with their directories") {
    val dir = tmp("bkt-gc")
    val kt  = new KeyedTable(spark, dir, "k", buckets = Some(4))
    (0L to 4L).foreach(b => kt.merge(Seq((b, s"v$b")).toDF("k", "v"), batchId = b))
    val dirs = new java.io.File(dir).listFiles().map(_.getName).count(_.matches("v\\d+"))
    assert(dirs <= 3, s"GC left $dirs snapshot dirs")
    // same construction as KeyedTable.tableName: md5(dir) first 8 hex chars
    val md     = java.security.MessageDigest.getInstance("MD5")
    val prefix = "graft_kt_" +
      md.digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val mine = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(prefix)).toSeq
    assert(mine.contains(s"${prefix}_v4"), s"latest version missing from catalog: $mine")
    // v2 and v3 survive (KeepSnapshots=2 superseded beside current v4);
    // anything older is dropped from catalog and disk
    assert(!mine.exists(t => t.endsWith("_v0") || t.endsWith("_v1")),
      s"superseded versions not dropped from catalog: $mine")
    assert(mine.contains(s"${prefix}_v2") && mine.contains(s"${prefix}_v3"),
      s"documented retention window (2 superseded) not honored: $mine")
    // the latest version must still read through the catalog
    assert(kt.read().get.count() == 5)
  }
}
