package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Structural invariants of `q_unimax_alloc` the row-wise oracle hash can't
  * state directly: the waterfilling output must actually BE a valid UniMax
  * allocation — budget respected with bounded slack, capped units pinned at
  * their cap, every uncapped unit at one shared level θ that sits strictly
  * below its own cap (otherwise it should have been capped) and at-or-above
  * every capped cap (level monotonicity). A wrong threshold pick satisfies
  * the row-local arithmetic but breaks one of these global properties.
  */
class UnimaxInvariantSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("allocation is a valid waterfilling: budget, caps, single level") {
    val out  = SparkEntry.queries("q_unimax_alloc")(spark, dir).cache()
    try {
      val tot = out.agg(
        sum("alloc").as("alloc_sum"), sum("tokens").as("budget"),
        sum(when(col("capped") === 0L, 1L).otherwise(0L)).as("n_uncapped")).head()
      val (allocSum, budget, nUncapped) =
        (tot.getLong(0), tot.getLong(1), tot.getLong(2))
      assert(allocSum <= budget, s"over budget: $allocSum > $budget")
      if (nUncapped > 0)
        assert(budget - allocSum < nUncapped,
          s"slack ${budget - allocSum} >= #uncapped $nUncapped — θ too small")
      else assert(allocSum == out.agg(sum("cap")).head().getLong(0))

      assert(out.filter(col("capped") === 1L && col("alloc") =!= col("cap")).isEmpty,
        "a capped unit was not allocated its cap")

      val levels = out.filter(col("capped") === 0L).select("alloc").distinct().collect()
      assert(levels.length <= 1, s"uncapped units at ${levels.length} distinct levels")
      for (l <- levels.headOption.map(_.getLong(0))) {
        assert(out.filter(col("capped") === 0L && col("cap") <= lit(l)).isEmpty,
          "an uncapped unit's cap is at-or-below θ — it should have been capped")
        val maxCapped = out.filter(col("capped") === 1L)
          .agg(coalesce(max("cap"), lit(0L))).head().getLong(0)
        assert(l >= maxCapped, s"θ $l below a capped cap $maxCapped")
      }

      assert(out.filter(col("eff_epochs_bp") > col("epochs") * 10000L).isEmpty,
        "a unit exceeds its epoch cap")
    } finally out.unpersist()
  }
}
