package graft

import org.apache.spark.sql.DataFrame
import graft.operators.LinkAnalysis

/** [[LinkAnalysis.pageRank]] — the integer fixed-point power iteration.
  *
  * Strategy: exact-value pins, not tolerances, because the operator's whole
  * design claim is bit-determinism. A d-regular graph with Scale divisible
  * by d is a FIXED POINT of the update rule (every node sends rank/d to d
  * neighbors and receives d of the same back, and 0.15·S + 0.85·S = S with
  * these integers exactly), so the cycle case pins the rule's algebra; the
  * star case pins the asymmetric flow against a hand-run of the same
  * arithmetic in Scala; the mass case pins conservation (floors only shed
  * sub-unit mass, never create it).
  */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  private val S = LinkAnalysis.Scale

  private def sym(pairs: Seq[(Long, Long)]): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def ranksOf(edges: DataFrame, iters: Int): Map[Long, (Long, Long)] =
    LinkAnalysis.pageRank(edges, iters).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** The operator's update rule, re-run on the driver over an adjacency
    * map — same integer floors, independently written.
    */
  private def reference(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var rank = adj.keys.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val recv = adj.toSeq
        .flatMap { case (u, vs) => val c = rank(u) / vs.size; vs.map(_ -> c) }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      rank = adj.keys.map(v => v -> (150000000L + 85L * recv.getOrElse(v, 0L) / 100L)).toMap
    }
    rank
  }

  test("4-cycle (2-regular, Scale % 2 == 0) is a fixed point at every round count") {
    val cycle = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    for (k <- Seq(0, 1, 5)) {
      val r = ranksOf(cycle, k)
      assert(r.keySet === Set(0L, 1L, 2L, 3L))
      r.values.foreach { case (deg, rank) => assert(deg === 2L); assert(rank === S) }
    }
  }

  test("star hub outranks leaves and matches the hand-run integer arithmetic") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    for (k <- Seq(1, 2, 5)) {
      val got = ranksOf(sym(star), k)
      val want = reference(star, k)
      assert(got.view.mapValues(_._2).toMap === want, s"iters=$k")
      val hub = got(0L)._2
      (1L to 4L).foreach(l => assert(hub > got(l)._2))
    }
    // hand-check one round explicitly: hub receives 4 leaves' S/1 each,
    // leaves receive S/4 from the hub
    val r1 = ranksOf(sym(star), 1)
    assert(r1(0L)._2 === 150000000L + 85L * (4 * S) / 100L)
    assert(r1(1L)._2 === 150000000L + 85L * (S / 4) / 100L)
  }

  test("path + triangle: matches reference and conserves mass within floor loss") {
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 10L))
    val got  = ranksOf(sym(pairs), 5)
    val want = reference(pairs, 5)
    assert(got.view.mapValues(_._2).toMap === want)
    val total = got.values.map(_._2).sum
    val n = got.size
    assert(total <= n * S)
    // each round each node floors away < deg + 100 units; 5 rounds, 7 nodes
    assert(total > n * S - 5L * n * 1000L)
  }

  test("iters = 0 returns the uniform start state with out-degrees") {
    val got = ranksOf(sym(Seq((5L, 6L), (6L, 7L))), 0)
    assert(got === Map(5L -> (1L, S), 6L -> (2L, S), 7L -> (1L, S)))
  }

  test("triangleCounts matches brute-force triple enumeration on seeded random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 4) {
      val n = 4 + rnd.nextInt(12)
      val pairs = (for {
        a <- 0L until n.toLong
        b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.4
      } yield (a, b)).toSeq
      val es = pairs.toSet
      // brute force: every ordered triple whose three edges exist
      val want = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong; c <- (b + 1) until n.toLong
        if es((a, b)) && es((b, c)) && es((a, c))
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got =
        if (pairs.isEmpty) Map.empty[Long, Long]
        else LinkAnalysis.triangleCounts(pairs.toDF("a", "b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial=$trial n=$n edges=${pairs.length}")
    }
  }

  test("kCore matches a driver-side peel on seeded random graphs and classic shapes") {
    def refCore(pairs: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
      var es = pairs
      for (_ <- 1 to rounds) {
        val deg  = es.flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.size)
        val keep = deg.filter(_._2 >= k).keySet
        es = es.filter(p => keep(p._1) && keep(p._2))
      }
      es.flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    def run(pairs: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
      LinkAnalysis.kCore(pairs.toDF("a", "b"), k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle + pendant chain: the chain peels away, the triangle survives
    val shape = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(shape, 2, 4) === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // pure path: 2-core is empty
    assert(run(Seq((0L, 1L), (1L, 2L), (2L, 3L)), 2, 4) === Map.empty)
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 3) {
      val n = 6 + rnd.nextInt(14)
      val pairs = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      if (pairs.nonEmpty)
        assert(run(pairs, 2, 4) === refCore(pairs, 2, 4), s"trial=$trial n=$n")
    }
  }

  test("labelPropagation matches a driver-side sync LPA on classic shapes and random graphs") {
    // independently-written synchronous plurality vote, (cnt desc, lab asc)
    def refLpa(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab = adj.keys.map(k => k -> k).toMap
      for (_ <- 1 to rounds) {
        lab = adj.map { case (v, ns) =>
          val votes = ns.map(lab).groupBy(identity).view.mapValues(_.size).toSeq
          v -> votes.minBy { case (l, c) => (-c, l) }._1
        }
      }
      lab
    }
    def run(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
      LinkAnalysis.labelPropagation(sym(pairs), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two triangles joined by one bridge: ONE component, but the plurality
    // vote must keep >= 2 communities alive (the chain-artifact split the
    // operator exists for); the left triangle's interior settles on its own
    // min id. (The bridge endpoints themselves trade min-id ties — the
    // exact assignment is pinned by the reference parity, not hand-listed.)
    val bridge = Seq((0L, 1L), (0L, 2L), (1L, 2L), (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L))
    val got = run(bridge, 4)
    assert(got === refLpa(bridge, 4))
    assert(got(0L) == 0L && got(1L) == 0L)
    assert(got.values.toSet.size >= 2, "bridge merged the two triangle communities")
    // random graphs: exact parity with the reference at every round count
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 3; rounds <- Seq(1, 4)) {
      val n = 5 + rnd.nextInt(15)
      val pairs = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.3
      } yield (a, b)).toSeq
      if (pairs.nonEmpty)
        assert(run(pairs, rounds) === refLpa(pairs, rounds), s"trial=$trial n=$n rounds=$rounds")
    }
  }

  test("bfsHops matches a driver-side BFS on chains, merges, and random graphs") {
    // independently-written frontier BFS (the formulation bfsHops
    // deliberately avoids) — parity proves the min-plus/self-loop relaxation
    // computes true bounded hop distances.
    def refBfs(pairs: Seq[(Long, Long)], seeds: Set[Long], rounds: Int): Map[Long, Long] = {
      val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      // contract: every seed is hop 0 from itself, in-graph or not
      var dist = seeds.map(_ -> 0L).toMap
      for (k <- 1 to rounds) {
        val next = dist.filter(_._2 == k - 1).keys
          .flatMap(adj.getOrElse(_, Nil)).filterNot(dist.contains)
        dist = dist ++ next.map(_ -> k.toLong)
      }
      dist
    }
    def run(pairs: Seq[(Long, Long)], seeds: Set[Long], rounds: Int): Map[Long, Long] =
      LinkAnalysis.bfsHops(sym(pairs), seeds.toSeq.toDF("id"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 6-path from one end: the graded corpus' near-clique graph never
    // exercises hop >= 2, so the multi-hop arithmetic is pinned HERE —
    // exact hops 0..3, nodes beyond the round horizon absent
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, Set(0L), 3) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // two seeds meeting mid-path: min wins at the merge point
    assert(run(path, Set(0L, 5L), 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    // rounds = 0: every seed at hop 0, in-graph or not
    assert(run(path, Set(0L, 99L), 0) === Map(0L -> 0L, 99L -> 0L))
    // ...and the out-of-graph seed SURVIVES relaxation rounds at hop 0 —
    // the rounds=0 / rounds>=1 contracts must agree (ADVICE r8: without the
    // seed self-loops, 99 appeared at rounds=0 but vanished at rounds>=1)
    assert(run(path, Set(0L, 99L), 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 99L -> 0L))
    // random graphs: exact parity at every round count
    val rnd = new scala.util.Random(53)
    for (trial <- 0 until 3; rounds <- Seq(1, 3)) {
      val n = 6 + rnd.nextInt(12)
      val pairs = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      val seeds = (0L until n.toLong).filter(_ => rnd.nextDouble() < 0.3).toSet
      if (pairs.nonEmpty && seeds.nonEmpty)
        assert(run(pairs, seeds, rounds) === refBfs(pairs, seeds, rounds),
          s"trial=$trial n=$n rounds=$rounds")
    }
  }

  test("seeded random graphs: distributed ranks equal the driver reference exactly") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 4) {
      val n = 5 + rnd.nextInt(20)
      val pairs = (for {
        a <- 0L until n.toLong
        b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.25
      } yield (a, b)).toSeq
      if (pairs.nonEmpty) {
        val got  = ranksOf(sym(pairs), 3).view.mapValues(_._2).toMap
        val want = reference(pairs, 3)
        assert(got === want, s"trial=$trial n=$n edges=${pairs.length}")
      }
    }
  }
}
