package graft

/** The approximate-search variants judged against the exact baseline: both
  * LSH and IVF must return a meaningful fraction of the true top-3 neighbors
  * (SURVEY.md §2.11 E2). Recall is deterministic here (fixed testdata, fixed
  * hyperplanes/codebook), so the floors pin current behavior — a hash or
  * codebook change that craters recall fails loudly.
  */
class AnnRecallSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def resultSet(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet

  test("LSH and IVF recall vs the brute-force top-3 baseline") {
    val exact = resultSet("q_cosine_topk")
    assert(exact.nonEmpty)
    val lsh = resultSet("q_ann_lsh")
    val ivf = resultSet("q_ann_ivf")

    def recall(approx: Set[(Long, Long)]): Double =
      approx.intersect(exact).size.toDouble / exact.size

    val (rLsh, rIvf) = (recall(lsh), recall(ivf))
    info(f"recall@3: lsh=$rLsh%.3f ivf=$rIvf%.3f over ${exact.size} exact pairs")
    // sanity floors: the buckets must capture SOME true neighbors, and the
    // approximate result must never exceed the exact pair count per probe
    assert(rLsh > 0.05, s"LSH recall collapsed: $rLsh")
    assert(rIvf > 0.05, s"IVF recall collapsed: $rIvf")
  }
}
