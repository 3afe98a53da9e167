package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the graph primitive behind
  * dedup-cluster canonicalization (every near-dup PAIR set is consumed as
  * components: a~b, b~c ⇒ {a,b,c} share one canonical id). Spark has no
  * built-in CC operator; this is iterative min-label propagation expressed
  * as DataFrame rounds.
  *
  * Scale posture (100 TB): each round is one shuffle join (edges × labels on
  * the edge endpoint) + one keyed min-aggregate — hash-partitioned on node
  * id, nothing global, no driver-side data. Labels persist between rounds so
  * no round re-executes upstream lineage. Rounds needed = graph diameter;
  * near-dup clusters are near-cliques (members collide in shared band
  * buckets) so the diameter is small in practice, making this the cheaper
  * round (one join + one agg); [[connectedAlternating]] is the O(log n)-round
  * large-star/small-star form for pathological chain graphs. Convergence
  * costs ONE single-row aggregate per round: labels only ever decrease, so
  * an unchanged label sum IS the fixpoint (decimal(38,0) keeps the sum
  * overflow-proof at any corpus size).
  */
object Components {

  /** @param nodes one column, the node id (long)
    * @param edges two long columns (a, b); treated as undirected
    * @return (id, lbl) — lbl is the minimum node id of `id`'s component
    */
  /** Shape guards shared by both CC forms: a descriptive failure beats the
    * opaque MatchError / silently-ignored extra columns (ADVICE r5).
    */
  private def checkShapes(nodes: DataFrame, edges: DataFrame): Unit = {
    require(edges.columns.length == 2,
      s"edges must have exactly 2 columns (a, b); got ${edges.columns.mkString("(", ", ", ")")}")
    require(nodes.columns.length == 1,
      s"nodes must have exactly 1 column (the node id); got ${nodes.columns.mkString("(", ", ", ")")}")
  }

  def connected(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    checkShapes(nodes, edges)
    val Seq(ac, bc) = edges.columns.toSeq.map(edges(_))
    val e   = edges.select(ac.as("a"), bc.as("b")).persist()
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    var labels = nodes.select(nodes.columns.map(nodes(_)).head.as("id"))
      .withColumn("lbl", col("id"))
      .persist()
    // sum() over zero rows is NULL — normalize so an empty node set reads
    // as already-converged instead of NPE-ing on compareTo
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var curSum  = labelSum(labels)
    var changed = labels.head(1).nonEmpty
    var rounds  = 0
    while (changed) {
      rounds += 1
      require(rounds <= maxRounds,
        s"component propagation did not converge in $maxRounds rounds")
      val msgs = sym.join(labels, sym("a") === labels("id"))
        .select(sym("b").as("id"), col("lbl"))
      // localCheckpoint, not persist: each round's LOGICAL PLAN embeds the
      // previous round's tree several times, so lineage grows exponentially
      // with rounds (plan printing alone OOMs) — checkpointing truncates
      // the plan each round and caches the data. On a cluster, a reliable
      // checkpoint() (or persist + replication) is the fault-tolerant form.
      val next = labels.union(msgs)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      changed = nextSum.compareTo(curSum) != 0
      curSum = nextSum
      labels.unpersist()
      labels = next
    }
    e.unpersist()
    labels
  }

  /** Connected components in O(log n) ROUNDS via alternating large-star /
    * small-star contraction (Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — the scale upgrade over [[connected]]'s
    * diameter-bound propagation: a path graph of length 10^6 converges in
    * ~20 rounds instead of 10^6. Each round is two keyed aggregates + a
    * join, all hash-partitioned on node id; convergence is an
    * order-insensitive edge-checksum comparison (one single-row aggregate).
    *
    * large-star: every node points its LARGER neighbors at the minimum of
    * its neighborhood (including itself); small-star: re-points its
    * smaller-or-equal neighbors likewise. At the fixpoint every edge is
    * (node → component minimum).
    */
  def connectedAlternating(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 60): DataFrame = {
    checkShapes(nodes, edges)
    val Seq(ac, bc) = edges.columns.toSeq.map(edges(_))
    // drop self-loops; orient arbitrarily — both passes re-symmetrize
    var e = edges.select(ac.as("a"), bc.as("b")).filter(col("a") =!= col("b"))
      .distinct().persist()
    // (hash-sum, count) pair: sum alone could collide across different edge
    // sets; with the count alongside, a false convergence needs a same-size
    // same-sum collision — vanishing odds, one single-row aggregate
    def checksum(df: DataFrame): (java.math.BigDecimal, Long) = {
      val r = df.agg(sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
        count(lit(1))).head
      (Option(r.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO), r.getLong(1))
    }
    def largeStar(in: DataFrame): DataFrame = {
      val sym = in.union(in.select(col("b").as("a"), col("a").as("b")))
      val m = sym.groupBy("a").agg(least(min("b"), first("a")).as("m"))
      sym.join(m, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    def smallStar(in: DataFrame): DataFrame = {
      // orient (hi, lo): every edge as (u, v) with v < u
      val dir = in.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      val m = dir.groupBy("a").agg(min("b").as("m"))
      dir.join(m, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .union(m.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    var cur     = checksum(e)
    var changed = cur._2 > 0
    var rounds  = 0
    while (changed) {
      rounds += 1
      require(rounds <= maxRounds,
        s"alternating contraction did not converge in $maxRounds rounds")
      // localCheckpoint for the same lineage-explosion reason as above —
      // each star pass references its input 3x, so the plan tree would grow
      // ~6x per round
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextSum = checksum(next)
      changed = nextSum != cur
      cur = nextSum
      e.unpersist()
      e = next
    }
    // fixpoint edges are (node → component min); singletons label themselves
    val roots = e.groupBy("a").agg(min("b").as("lbl"))
      .select(col("a").as("id"), col("lbl"))
    val ids = nodes.select(nodes.columns.map(nodes(_)).head.as("id"))
    val out = ids.join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("lbl"))
    e.unpersist()
    out
  }
}
