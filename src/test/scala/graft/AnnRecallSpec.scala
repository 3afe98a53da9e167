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

  /** Pinned below the observed two-stage PQ recall (see the test's info
    * line). This corpus is ~uniform on the unit sphere — PQ's worst case
    * (no manifold to spend codes on) — which is why the 16×16 config was
    * chosen over 8×16 (measured 0.80 vs 0.33); the companion correlation
    * pin guards the ADC estimator itself.
    */
  private val RecallFloorPq = 0.60

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

  test("PQ ADC recall vs the exact inner-product top-3") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.expressions.DotProductLong.dotLong
    // exact MIPS baseline over the same quantized vectors (PQ approximates
    // the inner product, not the cosine, so the fair reference is dot-rank)
    val base = Tables.embeddings(spark, dir)
      .filter(size(col("embedding")) === 64)
      .withColumn("q", expr(graft.queries.Dialect.quantSql))
      .filter(dotLong(col("q"), col("q")) > 0)
      .select("vec_id", "q")
    val probes = base.filter(col("vec_id").isin(graft.queries.SimilarityQueries.ProbeIds: _*))
      .select(col("vec_id").as("qid"), col("q").as("qq"))
    val exact = base.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .withColumn("score", dotLong(col("qq"), col("q")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)))
      .filter(col("rank") <= 3)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val pqDf = SparkEntry.queries("q_pq_adc")(spark, dir)
    val pq = pqDf.select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val r = pq.intersect(exact).size.toDouble / exact.size
    info(f"PQ two-stage recall@3 vs exact dot: $r%.3f over ${exact.size} pairs")
    assert(r >= RecallFloorPq,
      s"PQ recall regressed below pinned floor: $r")
    // the ADC estimator must track the exact inner product tightly over
    // the UNRESTRICTED probe × corpus population (Pearson over the final
    // re-ranked rows alone is range-restricted into noise) — an
    // assignment/LUT regression (e.g. the argmax-dot assignment bug this
    // pin was born from) craters it
    import graft.queries.SimilarityQueries.{pqAdcPairs, trainPq}
    val allPairs = pqAdcPairs(spark, dir, trainPq(spark, dir))
      .join(base.select(col("vec_id"), col("q").as("vq")), "vec_id")
      .join(probes, "qid")
      .withColumn("score", dotLong(col("qq"), col("vq")).cast("double"))
      .withColumn("adc_d", col("adc").cast("double"))
    val corr = allPairs.stat.corr("adc_d", "score")
    info(f"ADC-vs-exact score correlation (all pairs): $corr%.3f")
    // observed 0.64 with the 16×16×2-iteration codebook on this
    // incompressible corpus (0.43 at 8×16×1) — pinned with slack
    assert(corr >= 0.50, s"ADC score correlation regressed: $corr")
    val maxPerProbe = pqDf
      .groupBy("qid").count().agg(max("count")).collect()(0).getLong(0)
    assert(maxPerProbe <= 3, s"q_pq_adc emitted $maxPerProbe rows for one probe")
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
