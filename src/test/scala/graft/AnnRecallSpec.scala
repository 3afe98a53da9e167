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
    // recall is deterministic (fixed data, fixed codebooks): pin the current
    // levels with small slack so a hash/codebook regression fails loudly
    assert(rLsh >= 0.70, s"LSH recall regressed below pinned floor: $rLsh (was 0.833 with Hamming-1 multi-probe)")
    assert(rIvf >= 0.60, s"IVF recall regressed below pinned floor: $rIvf (was 0.700 with the 2-iteration-trained codebook, 4 probe lists)")
    // structural cap: at most 3 ranked rows per probe in every variant
    Seq("q_cosine_topk", "q_ann_lsh", "q_ann_ivf").foreach { name =>
      val maxPerProbe = SparkEntry.queries(name)(spark, dir)
        .groupBy("qid").count().agg(org.apache.spark.sql.functions.max("count"))
        .collect()(0).getLong(0)
      assert(maxPerProbe <= 3, s"$name emitted $maxPerProbe rows for one probe")
    }
  }

  test("planBits sizes LSH bits-per-table with the corpus (executable deployment knob)") {
    import graft.queries.SimilarityQueries.planBits
    // this build's constant: 2k test vectors → the hard-coded 4 bits
    assert(planBits(2000L) == 4)
    // deployment scale: 10^9 rows → ~2^23 buckets keeps the expected bucket
    // at the same constant size (log2(1e9/125) ≈ 22.9)
    assert(planBits(1000000000L) == 23)
    // monotone, and degenerate corpora still get a non-trivial key
    assert(planBits(1L) == 1)
    assert(planBits(1000000L) >= planBits(10000L))
    assertThrows[IllegalArgumentException](planBits(0L))
  }

  test("LSH-blocked embedding dedup is a subset of the exact-within-label pairs") {
    // the candidate→verify composition makes precision exactly 1 relative to
    // the exact form: every emitted pair passed the same cosine test, so the
    // ONLY admissible difference is missed candidates (recall < 1, the price
    // of scale-safe blocking). A non-subset result means the blocking or the
    // verify drifted from the exact semantics.
    def pairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val exact   = pairs("q_dedup_embedding")
    val blocked = pairs("q_embedding_lsh_pairs")
    assert(exact.nonEmpty)
    assert(blocked.subsetOf(exact),
      s"blocked pairs not a subset of exact: ${(blocked -- exact).take(5)}")
    val rBlocked = blocked.size.toDouble / exact.size
    info(f"blocked recall vs exact-within-label: $rBlocked%.3f")
    // deterministic (fixed data + hyperplanes): pin with slack below the
    // observed 0.354 so a plane/bucketing regression that craters candidate
    // recall fails loudly
    assert(rBlocked >= 0.25,
      s"blocked-dedup recall regressed below pinned floor: $rBlocked (was 0.354)")
  }
}
