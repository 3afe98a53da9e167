package graft

/** The phase-capture contract over every [[Bench.PhasedQueries]] entry
  * (VERDICT r11 next-step #3 and its r12 extension): the bench's dedicated
  * diagnostic evaluation runs each of these queries under a
  * [[Phases.capture]], and for the capture-sensitive composites that
  * evaluation executes a DIFFERENT physical shape (eager persist+count
  * stages). Two invariants keep that honest:
  *
  *  1. ROW PARITY — the captured evaluation returns exactly the plain lazy
  *     plan's rows. The graded output must be one thing, whichever shape
  *     computed it.
  *  2. ATTRIBUTION — every entry actually records at least one phase (an
  *     entry that records none is paying the extra evaluation for
  *     nothing), and the expected stage names are pinned per query so a
  *     refactor cannot silently rename or drop a split the round
  *     artifacts track across rounds.
  */
class PhasedQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private val expectedPhases: Map[String, Seq[String]] = Map(
    "q_ann_ivfpq" -> Seq("train_coarse", "train_pq", "encode_write", "search"),
    "q_pq_adc" -> Seq("train_pq"),
    "q_crossmodal_dups" -> Seq("simhash_side", "phash_side", "pair_join"),
    "q_hybrid_rrf" -> Seq("lexical_side", "semantic_side", "fuse"),
    "q_semdedup" -> Seq("train_coarse"),
    "q_containment_pairs" -> Seq("gram_agg", "pair_expand"),
    // r14, the iterative graph family (VERDICT r13 #5): convergence-round
    // regressions vs trunk regressions become attributable
    "q_dup_clusters" -> Seq("cc_seed", "cc_rounds"),
    "q_reach_hops" -> Seq("edge_derive", "hop_rounds"),
    // r15, the last two >=2 s-median keys (VERDICT r14 #5)
    "q_pagerank" -> Seq("edge_derive", "rank_rounds"),
    "q_dup_span_coverage" -> Seq("shingle_pos", "dup_df", "island_agg"))

  test("the expectation table and Bench.PhasedQueries are the same set") {
    assert(expectedPhases.keySet === Bench.PhasedQueries,
      "a new phased query needs a row here; a dropped one must leave the set")
  }

  for (name <- Bench.PhasedQueries.toSeq.sorted)
    test(s"$name: capture changes no rows, attributes its stages, leaks no cache") {
      val q = SparkEntry.queries(name)
      // cache accounting baseline: the PLAIN evaluation's own persisted
      // lineage (shared shingle/payload frames deliberately stay cached —
      // file-head note in DedupQueries)
      Bench.clearAllCaches(spark)
      val plain = q(spark, dir).collect().toSeq
      val plainCached = spark.sparkContext.getPersistentRDDs.size
      Bench.clearAllCaches(spark)
      val (captured, phases) = Phases.capture(q(spark, dir).collect().toSeq)
      assert(captured === plain,
        s"$name: phase-captured evaluation changed the graded output")
      assert(phases.map(_._1) === expectedPhases(name),
        s"$name: expected stages ${expectedPhases(name)}, got $phases")
      assert(phases.forall(_._2 >= 0.0))
      // ADVICE r12: a capture must leave no stage frame behind — at most
      // the plain plan's own persisted lineage (the stage-based composites
      // unpersist their sides AND skip persisting the final frame, so they
      // typically leave LESS than the plain run)
      assert(spark.sparkContext.getPersistentRDDs.size <= plainCached,
        s"$name: capture left more cached frames than the plain plan")
    }
}
