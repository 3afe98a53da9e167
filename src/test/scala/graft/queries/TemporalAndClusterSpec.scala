package graft.queries

import org.apache.spark.sql.Row

import graft.{SparkEntry, SparkTestBase, Tables}

/** Behavior pins for the round-5 operators — each graded query checked
  * against an in-test brute-force reference at sf0.001 (test-only collect:
  * ~1k events / ~50 docs), plus the plan-shape properties that make them
  * scale: the as-of join must stay join-free (pure keyed window) and the
  * range join must stay a hash equi-join (no nested-loop fallback).
  */
class TemporalAndClusterSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // (event_id, user_id, us, event_type) collected once for the brute forces
  private lazy val events: Seq[(Long, Long, Long, String)] =
    Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "unix_micros(ts) as us", "event_type")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q_asof_join matches the brute-force latest-prior-view pick") {
    val views     = events.filter(_._4 == "view")
    val purchases = events.filter(_._4 == "purchase")
    val want = purchases.map { case (pid, u, pus, _) =>
      val prior = views.filter(v => v._2 == u && v._3 <= pus)
      if (prior.isEmpty) (pid, u, pus, None, None)
      else {
        // latest us wins; max event_id breaks a same-instant tie (the
        // query's groupBy(user, us).agg(max(event_id)) collapse)
        val best = prior.maxBy(v => (v._3, v._1))
        (pid, u, pus, Some(best._1), Some(best._3))
      }
    }.sortBy(_._1)
    val got = run("q_asof_join").collect().toSeq.map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(got == want)
    // the testdata must actually exercise both branches
    assert(want.exists(_._4.isEmpty) && want.exists(_._4.nonEmpty))
  }

  test("q_asof_join gap_us is non-negative and consistent") {
    run("q_asof_join").collect().foreach { r =>
      if (!r.isNullAt(5)) {
        assert(r.getLong(5) >= 0)
        assert(r.getLong(5) == r.getLong(2) - r.getLong(4))
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
  }

  test("q_asof_join is join-free: one keyed window, no join operator at all") {
    val p = run("q_asof_join").queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of join fell back to a physical join:\n${p.take(1500)}")
    assert(p.contains("Window"), "expected the union-tag window")
  }

  test("q_range_join matches the brute-force +/-5min counts") {
    val errors = events.filter(_._4 == "error")
    val others = events.filter(_._4 != "error")
    val want = errors.map { case (eid, u, eus, _) =>
      (eid, u, others.count(o => o._2 == u && math.abs(o._3 - eus) <= 300000000L).toLong)
    }.sortBy(_._1)
    val got = run("q_range_join").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got == want)
    // zero-count errors must survive the left join (and matches must exist)
    assert(want.exists(_._3 == 0L) && want.exists(_._3 > 0L))
  }

  test("q_range_join stays a hash equi-join (no nested-loop / cartesian fallback)") {
    val p = run("q_range_join").queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell out of the banded equi-join shape:\n${p.take(1500)}")
  }

  test("q_dup_clusters matches union-find over the graded candidate pairs") {
    // edges = the already-graded q_dedup_minhash output, so this pin also
    // fixes the contract that clusters are components OF THAT pair set
    val edges = run("q_dedup_minhash").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, dir).select("doc_id")
      .collect().toSeq.map(_.getLong(0))
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = docs.map(d => (d, find(d))).sortBy(_._1)
    val got = run("q_dup_clusters").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got == want)
    // the corpus must contain a transitive cluster of size >= 2 for the
    // propagation loop to be exercised
    assert(want.exists { case (d, c) => d != c })
  }

  test("q_token_quantiles matches the brute-force sorted-rank pick") {
    // token counts come from the graded q_token_count surface so the two
    // queries cannot disagree on tokenization
    val toks = run("q_token_count").select("doc_id", "ws_tokens").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val bySource = Tables.documents(spark, dir).select("doc_id", "source")
      .collect().toSeq.map(r => (r.getString(1), toks(r.getLong(0))))
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sorted) }
    def pick(xs: Seq[Long], p: Int): Long = xs((((p.toLong * xs.size) + 99) / 100 - 1).toInt.max(0))
    val want = bySource.toSeq.map { case (s, xs) =>
      Row(s, xs.size.toLong, xs.min, xs.max,
        pick(xs, 25), pick(xs, 50), pick(xs, 75), pick(xs, 90))
    }.sortBy(_.getString(0))
    val got = run("q_token_quantiles").collect().toSeq
    assert(got == want)
  }
}
