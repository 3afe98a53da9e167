package graft

import java.nio.file.Files

/** Partition pruning over a PARTITIONED physical layout — the 100 TB scan
  * discipline the single-file test corpus cannot exercise through the graded
  * queries: a deployment lays `events` out as
  * `events/event_type=.../part-*.parquet` (or date-partitioned), and both
  * static pruning (literal predicate → partitions skipped at planning) and
  * DYNAMIC partition pruning (the partition filter only learnable from a
  * joined dim side at runtime — Spark injects a subquery filter reusing the
  * broadcast) must engage, or every query pays a full-corpus scan.
  *
  * The engine's own partitioned stores (`AnnIndex` cid=/pb= layouts, the
  * incremental dedup band index) prune manually with pushed `isin` filters;
  * THIS spec pins that the standard catalyst machinery is also live for
  * plain partitioned tables, so a deployment gets pruning without the
  * manual path.
  */
class PartitionPruningSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val scratch: String = {
    val s = Files.createTempDirectory("graft-dpp").toString
    Tables.events(spark, dir).write.mode("overwrite")
      .partitionBy("event_type").parquet(s"$s/events_p")
    // the dim must be a FILE source: a local Seq's Filter(LocalRelation)
    // constant-folds away, and DPP only fires on a surviving selective
    // predicate on the dim side
    Seq(("purchase", 1L), ("error", 2L), ("view", 3L)).toDF("event_type", "w")
      .write.mode("overwrite").parquet(s"$s/dim")
    s
  }
  private def layout: String = s"$scratch/events_p"

  test("static partition pruning: a literal predicate reaches PartitionFilters") {
    val fact = spark.read.parquet(layout)
    val q = fact.filter($"event_type" === "purchase").groupBy($"user_id").count()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      s"partition predicate did not reach the scan:\n${p.take(1500)}")
    // and the non-partition columns still prune: ReadSchema must not carry
    // the unreferenced payload columns
    assert(!p.contains("props"), s"unprojected column read:\n${p.take(1500)}")
  }

  test("dynamic partition pruning: a dim-side filter prunes the fact scan at runtime") {
    val fact = spark.read.parquet(layout)
    // the selective dim: the partition filter is only knowable by JOINING —
    // exactly the star-join shape where DPP saves the 100 TB scan
    val dim = spark.read.parquet(s"$scratch/dim").filter($"w" === 1L)
    val q = fact.join(dim, "event_type").groupBy($"event_type").count()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"no dynamic pruning subquery in the fact scan:\n${p.take(2000)}")
    // semantics unchanged by the pruning
    val rows = q.collect()
    assert(rows.length === 1 && rows.head.getString(0) === "purchase")
  }
}
