package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** A keyed table with atomic-publish semantics — the engine's analog of the
  * reference's single CSV rewritten via tmp + fsync + os.replace
  * (pet_scraper.py:468-498, server.py:299-307).
  *
  * Layout: `dir/v<version>/` parquet snapshots plus a tiny `_LATEST` pointer
  * file, itself published atomically (tmp + ATOMIC_MOVE — the same
  * publish-then-swap the reference uses). Readers resolve `_LATEST` and only
  * ever see a fully-committed snapshot; a crash mid-write leaves a dangling
  * `v*` directory that is never referenced (the commit-protocol orphan the
  * reference cleans at server.py:245-252 — harmless here, GC'd on publish).
  *
  * Scale posture: snapshots are plain parquet directories written by the
  * cluster (partitioned/bucketed at 100 TB); only the 20-byte pointer file is
  * driver-side. Version = streaming batch id, which makes the sink idempotent
  * under foreachBatch's at-least-once replay (T4): a replayed batch publishes
  * the same version and is skipped.
  */
final class KeyedTable(spark: SparkSession, dir: String, val key: String) {

  private val root    = Paths.get(dir)
  private val pointer = root.resolve("_LATEST")

  Files.createDirectories(root)

  def latestVersion(): Option[Long] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim.toLong)
    else None

  def read(): Option[DataFrame] =
    latestVersion().map(v => spark.read.parquet(root.resolve(s"v$v").toString))

  /** True iff `version` is already visible — a foreachBatch replay (T3/T4). */
  def alreadyPublished(version: Long): Boolean =
    latestVersion().exists(_ >= version)

  /** Write a full snapshot as `v<version>` and atomically swing the pointer.
    * Parquet write is the cluster-side heavy path (Spark's commit protocol
    * already publishes the directory all-or-nothing); the pointer swap is the
    * reference's os.replace.
    */
  def publish(df: DataFrame, version: Long): Unit = {
    df.write.mode("overwrite").parquet(root.resolve(s"v$version").toString)
    val tmp = root.resolve(s"_LATEST.tmp.$version")
    Files.write(tmp, version.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Keyed upsert of one micro-batch (J4 semantics — pet_scraper.py:410-466):
    * merge into the current snapshot (or bootstrap from the batch), publish as
    * `version`. Replayed versions are skipped, making the sink effectively
    * exactly-once under foreachBatch's at-least-once replay. Intra-batch
    * duplicate keys are resolved before the merge (server.py:207's intra-batch
    * dedup): highest `seqCol` wins when given, else an arbitrary-but-single
    * row per key.
    */
  def merge(updates: DataFrame, version: Long, seqCol: Option[String] = None): Unit = {
    if (alreadyPublished(version)) return
    import org.apache.spark.sql.functions.col
    val order   = seqCol.map(c => col(c).desc).getOrElse(col(key).asc)
    val deduped = Relational.topKPerGroup(updates, Seq(col(key)), Seq(order), 1).drop("rn")
    val merged = read() match {
      case Some(existing) => Relational.upsertMerge(existing, deduped, key)
      case None           => deduped
    }
    publish(merged, version)
  }
}
