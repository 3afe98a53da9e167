package graft
import org.apache.spark.sql.functions.{col, expr, to_json, xxhash64}

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Harness rules (VERDICT r1 #7):
  *  - deterministic (sorted) query order, so no query silently absorbs
  *    JIT/codegen warm-up for the others;
  *  - a full warm-up pass first, so timed numbers measure the plan, not
  *    first-touch class loading;
  *  - evaluation is forced with a hash-aggregate over EVERY output column —
  *    `.count()` would let Catalyst prune away the very expressions under
  *    test;
  *  - failures are surfaced (stderr + "errors" map + value -1), never
  *    swallowed into a fast-looking number.
  */
object Bench {

  /** Force full evaluation of a frame, touching every output column: hash
    * all columns per row, xor-fold to one value. Shared with the dev timing
    * tool so the two cannot diverge. Map columns (at ANY nesting depth)
    * aren't hashable by xxhash64 — serialize those first (ADVICE r2), so a
    * map-returning query is timed, not failed. bit_xor, not sum: a 60M-row
    * sum of 64-bit hashes overflows under ANSI mode; xor is
    * order-insensitive and cannot overflow.
    */
  private[graft] def forceFrame(df: org.apache.spark.sql.DataFrame): Unit = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      dt match {
        case _: MapType      => true
        case a: ArrayType    => hasMap(a.elementType)
        case s: StructType   => s.fields.exists(f => hasMap(f.dataType))
        case _               => false
      }
    }
    val hashable = df.schema.fields.map { f =>
      if (hasMap(f.dataType)) to_json(col(f.name)) else col(f.name)
    }
    df.select(xxhash64(hashable: _*).as("h"))
      .agg(expr("bit_xor(h)")).collect()
    ()
  }

  /** Full cache hygiene between query evaluations: `clearCache` frees
    * Dataset-level persists, but queries built on explicitly-owned RDD
    * persists (`Lineage.materialize` loops — dup-clusters, k-core — and the
    * lazy-checkpoint aggregates) leave RAW RDD blocks behind that
    * clearCache cannot see. In a 125-query × 4-evaluation single-JVM bench
    * those leaks compound (~100 orphaned block sets by the tail) and were
    * measured inflating EVERY query ~2.4× through block-manager/memory
    * pressure — so the runner sweeps `getPersistentRDDs` too. Shared by
    * Bench/Verify/ScaleSmoke/TimeQ so no runner can drift back.
    */
  private[graft] def clearAllCaches(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  /** (steal, total) jiffies from /proc/stat's aggregate cpu line. Emitted as
    * a steal%-over-the-run field so a slow total is attributable: this host
    * is virtualized, and r3's driver total (157s) vs a clean re-run (41s)
    * was pure hypervisor steal — undetectable after the fact without this
    * (VERDICT r3 next-step #7).
    */
  private def cpuJiffies(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val cols = src.getLines().find(_.startsWith("cpu "))
          .get.trim.split("\\s+").drop(1).map(_.toLong)
        Some((if (cols.length > 7) cols(7) else 0L, cols.sum))
      } finally src.close()
    } catch { case _: Exception => None }

  private def loadAvg1(): Option[Double] =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try Some(src.getLines().next().split("\\s+")(0).toDouble)
      finally src.close()
    } catch { case _: Exception => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalSpark.session(cpus, "graft-bench")
    val jiffies0 = cpuJiffies()

    /** Run one query to completion, touching every output column. */
    def force(name: String): Option[String] =
      try {
        forceFrame(SparkEntry.queries(name)(spark, sfDir))
        None
      } catch { case e: Throwable =>
        Some(e.toString.replaceAll("\\s+", " ").take(300))
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up: classloading, codegen, parquet footers (cache-swept like the
    // timed loop — warm-up leaks pollute the timed numbers identically)
    names.foreach { n => clearAllCaches(spark); force(n) }
    // median of 3 post-warm-up repeats per query (VERDICT r5 next-step #5):
    // this host is virtualized, and a single-shot number conflates the plan
    // with whatever the hypervisor was doing that second — r3/r5 driver
    // totals were adjudication exercises (43s vs 105s for the same plans).
    // The median of 3 discards one arbitrarily-contended run per query, so
    // consecutive totals agree within ~20% even under moderate load.
    val Repeats = 3
    val timed = names.map { name =>
      val runs = (1 to Repeats).map { _ =>
        // drop caches persisted by OTHER queries' evaluation (canonicalized
        // subplans match across queries, so e.g. the shingle cache one query
        // persisted would silently serve its siblings) AND by this query's
        // own previous repeat: each timed number must measure the query's
        // own full pipeline. Intra-query persists still apply — they happen
        // during this query's own evaluation.
        clearAllCaches(spark)
        val t0 = System.nanoTime()
        val err = force(name)
        (if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
      }
      val err = runs.flatMap(_._2).headOption
      val ok  = runs.map(_._1).filter(_ >= 0)
      val median =
        if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.length / 2)
      err.foreach(m => System.err.println(s"[bench] $name FAILED: $m"))
      // ANY failed repeat marks the query failed (-1 + errors entry): a
      // median over the surviving repeats would print a healthy-looking
      // number for a flaky query while total excludes it — the two fields
      // must stay consistent
      (name, if (err.isEmpty) median else -1.0, err)
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = timed.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = timed.collect { case (k, _, Some(m)) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    val total = timed.collect { case (_, v, None) => v }.sum
    // machine-load context for the timings: steal% of all cpu jiffies over
    // the run (warm-up included) + 1-min loadavg at the end
    val load = (for ((s0, t0) <- jiffies0; (s1, t1) <- cpuJiffies()) yield {
      val stealPct =
        if (t1 > t0) math.round((s1 - s0) * 10000.0 / (t1 - t0)) / 100.0 else 0.0
      s""""steal_pct":$stealPct"""
    }).toSeq ++ loadAvg1().map(l => s""""loadavg1":$l""").toSeq
    val loadJson = load.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","repeats":$Repeats,"queries":$qs,"errors":$errs,"load":$loadJson,"sf":"$sfDir"}""")
    // The full line above grows with the query count and the driver keeps
    // only the tail of the output, so every round's headline total was lost
    // to truncation (BENCH_r*.json "parsed": null, VERDICT r6 #4). Repeat
    // the headline fields on two SHORT lines that the tail always keeps:
    // the top-10 slowest per-query timings (r7's truncation cut the head of
    // the full map, losing exactly the queries anyone tracks round-over-
    // round — VERDICT r7 #8), then the total. Distinct metric names so a
    // JSON-lines consumer filtering metric=="total" never double-counts
    // (ADVICE r7).
    val slowest = timed.filter(_._3.isEmpty).sortBy(-_._2).take(10)
      .map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    println(s"""{"metric":"slowest10","unit":"sec","queries":$slowest,"sf":"$sfDir"}""")
    val failed = timed.count(_._3.isDefined)
    println(s"""{"metric":"total_short","value":$total,"unit":"sec","repeats":$Repeats,"queries_run":${names.length},"queries_failed":$failed,"load":$loadJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
