package graft

import graft.operators.Components

/** Both connected-components algorithms ([[Components.connected]] — simple
  * min-label propagation, rounds = diameter — and
  * [[Components.connectedAlternating]] — large-star/small-star, O(log n)
  * rounds) must produce identical labelings: component minimum everywhere.
  * Checked against an in-test union-find over seeded random graphs including
  * the adversarial shapes (long paths — where the alternating form earns its
  * keep — stars, cliques, singletons, empty).
  */
class ComponentsSpec extends SparkTestBase {

  import spark.implicits._

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def run(algo: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame,
      n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (0L until n).toDF("id")
    val e = if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("a", "b")
            else edges.toDF("a", "b")
    algo(nodes, e).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def cases: Seq[(String, Long, Seq[(Long, Long)])] = {
    val rnd = new scala.util.Random(7)
    Seq(
      ("empty", 0L, Seq.empty),
      ("singletons", 5L, Seq.empty),
      ("one edge", 4L, Seq((2L, 3L))),
      // a 30-node path: diameter 29 — the shape simple propagation is slow on
      ("path", 30L, (0L until 29L).map(i => (i, i + 1))),
      ("star on max", 10L, (0L until 9L).map(i => (9L, i))),
      ("two cliques", 8L, (for { i <- 0 until 4; j <- i + 1 until 4 } yield (i.toLong, j.toLong)) ++
        (for { i <- 4 until 8; j <- i + 1 until 8 } yield (i.toLong, j.toLong))),
      ("random sparse", 40L, Seq.fill(25)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)),
      ("random dense", 20L, Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter(p => p._1 != p._2))
    )
  }

  test("connected (min-label propagation) matches union-find on all graph shapes") {
    cases.foreach { case (name, n, edges) =>
      assert(run(Components.connected(_, _), n, edges) == unionFind(n, edges), s"case $name")
    }
  }

  test("connectedAlternating (large-star/small-star) matches union-find on all graph shapes") {
    cases.foreach { case (name, n, edges) =>
      assert(run(Components.connectedAlternating(_, _), n, edges) == unionFind(n, edges),
        s"case $name")
    }
  }
}
