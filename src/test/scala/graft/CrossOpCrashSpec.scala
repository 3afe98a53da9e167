package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{IncrementalDedup, KeyedTable, Packing, Sketches}

/** Cross-operator crash consistency (VERDICT r6 #8): three KeyedTable
  * operators — incremental dedup index, CMS, packing — share ONE
  * foreachBatch body. A crash BETWEEN two publishes leaves the tables at
  * DIFFERENT applied-batch ids; on the replay foreachBatch guarantees
  * (same batch id, same data), each operator's own `alreadyApplied` guard
  * must let the already-published operators skip and the interrupted ones
  * apply — converging every table to the uninterrupted run's end state.
  */
class CrossOpCrashSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private final class InjectedCrash extends RuntimeException("kill between publishes")

  private case class Trio(dedup: KeyedTable, cms: KeyedTable, pack: KeyedTable)

  private def mkTrio(tag: String): Trio = {
    def tmp(op: String) =
      java.nio.file.Files.createTempDirectory(s"xop_${tag}_$op").toString
    Trio(
      new KeyedTable(spark, tmp("dedup"), "doc_id"),
      new KeyedTable(spark, tmp("cms"), "cell"),
      new KeyedTable(spark, tmp("pack"), "doc_id"))
  }

  /** The shared batch body: three publishes in a fixed order, with an
    * optional injected crash after the k-th (0 = run to completion).
    */
  private def runBatch(t: Trio, docs: DataFrame, id: Long, crashAfter: Int = 0): Unit = {
    IncrementalDedup.processBatch(t.dedup, docs, id).unpersist()
    if (crashAfter == 1) throw new InjectedCrash
    Sketches.updateCms(t.cms, docs, id)
    if (crashAfter == 2) throw new InjectedCrash
    Packing.updatePacked(t.pack, docs, id)
  }

  // doc_id-range batches: ordered across batches per source, so the packing
  // end state is also checkable against the graded batch query
  private def batch(i: Long): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") >= i * 170 && col("doc_id") < (i + 1) * 170)

  private def endState(t: Trio): (Seq[String], Seq[String], Seq[String]) = {
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    (rows(t.dedup.read().get),
      rows(t.cms.read().get.select("r", "bucket", "cnt")),
      rows(t.pack.read().get))
  }

  private def runWithCrash(crashAfter: Int): Trio = {
    val t = mkTrio(s"crash$crashAfter")
    runBatch(t, batch(0), 0L)
    intercept[InjectedCrash] { runBatch(t, batch(1), 1L, crashAfter) }
    // the crash must really have split the batch across publishes: every
    // operator before the kill recorded batch 1, every one after did not
    assert(t.dedup.alreadyApplied(1L))
    assert(t.cms.alreadyApplied(1L) == (crashAfter == 2))
    assert(!t.pack.alreadyApplied(1L))
    runBatch(t, batch(1), 1L) // foreachBatch replay: same id, same data
    runBatch(t, batch(2), 2L)
    t
  }

  test("kill between publishes, resume: all three end states match the uninterrupted run") {
    val base = mkTrio("base")
    (0L to 2L).foreach(i => runBatch(base, batch(i), i))
    val want = endState(base)
    assert(endState(runWithCrash(1)) == want) // died after dedup publish
    assert(endState(runWithCrash(2)) == want) // died after cms publish
    // sanity: the run produced real state, not three empty tables
    assert(want._1.nonEmpty && want._2.nonEmpty && want._3.nonEmpty)
  }

  test("streamed packing end state equals the graded batch query's assignment") {
    val t = mkTrio("parity")
    (0L to 2L).foreach(i => runBatch(t, batch(i), i))
    val got = t.pack.read().get
      .select("source", "doc_id", "tok", "pack_id", "pack_off")
      .collect().map(_.toString).sorted.toSeq
    val want = SparkEntry.queries("q_pack_sequences")(spark, dir)
      .select("source", "doc_id", "tok", "pack_id", "pack_off")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }
}
