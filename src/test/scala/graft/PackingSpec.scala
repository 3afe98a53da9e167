package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Packing

/** Streaming sequence packing ([[Packing.packStream]]): per-source offsets
  * must carry across micro-batches, replay-deterministically, and — when the
  * corpus arrives in doc_id order — reproduce the batch query's assignment.
  */
class PackingSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def batchPacked(): Map[(String, Long), (Long, Long)] =
    SparkEntry.queries("q_pack_sequences")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap

  test("streamed doc_id-ordered batches reproduce the batch packing") {
    val docs = Tables.documents(spark, dir)
      .selectExpr("source", "doc_id",
        "cast(size(split(trim(coalesce(text, '')), ' +')) as bigint) AS tok")
      .as[(String, Long, Long)]
      .collect()
      .sortBy(_._2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val q = Packing.packStream(in.toDS()).writeStream
      .format("memory").queryName("packed_out").outputMode("append").start()
    try {
      // three doc_id-ascending batches (per source ascending follows)
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { b =>
        in.addData(b.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("packed_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val want = batchPacked()
      assert(got.size == want.size, s"row counts differ: ${got.size} vs ${want.size}")
      val diff = want.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }
      assert(diff.isEmpty, s"first mismatches: ${diff.take(5)}")
    } finally q.stop()
  }

  test("offsets continue across batches within one pack") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val q = Packing.packStream(in.toDS(), budget = 100L).writeStream
      .format("memory").queryName("packed_small").outputMode("append").start()
    try {
      in.addData(("s", 1L, 60L)); q.processAllAvailable()
      in.addData(("s", 2L, 30L), ("s", 3L, 30L)); q.processAllAvailable()
      val rows = spark.table("packed_small")
        .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      // doc 2 starts at offset 60 (same pack); doc 3 at 90 → still pack 0
      // (its FIRST token lands below the budget), doc 4 would start pack 1
      assert(rows == Set((1L, 0L, 0L), (2L, 0L, 60L), (3L, 0L, 90L)), rows.toString)
      in.addData(("s", 4L, 10L)); q.processAllAvailable()
      val r4 = spark.table("packed_small")
        .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
      assert(r4.contains((4L, 1L, 20L)), r4.toString)
    } finally q.stop()
  }
}
