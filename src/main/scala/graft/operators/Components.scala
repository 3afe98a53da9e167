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
  * buckets) so the diameter is small in practice — the O(log n)-round
  * large-star/small-star scheme is the drop-in upgrade if a pathological
  * chain graph ever appears. Convergence costs ONE single-row aggregate per
  * round: labels only ever decrease, so an unchanged label sum IS the
  * fixpoint (decimal(38,0) keeps the sum overflow-proof at any corpus size).
  */
object Components {

  /** @param nodes one column, the node id (long)
    * @param edges two long columns (a, b); treated as undirected
    * @return (id, lbl) — lbl is the minimum node id of `id`'s component
    */
  def connected(nodes: DataFrame, edges: DataFrame, maxRounds: Int = 50): DataFrame = {
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
      val next = labels.union(msgs)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .persist()
      val nextSum = labelSum(next)
      changed = nextSum.compareTo(curSum) != 0
      curSum = nextSum
      labels.unpersist()
      labels = next
    }
    e.unpersist()
    labels
  }
}
