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
  *
  * PROCESS ISOLATION (VERDICT r9 = r8 next-step #1): a single JVM timing
  * 138 queries × 4 evaluations accumulates state clearAllCaches cannot
  * shed — JIT code-cache geometry, GC heap shape, block-manager history —
  * measured inflating TAIL queries ~2× over their idle-standalone cost
  * even after the r8 raw-RDD sweep (q_bloom_decontaminate 4.86 s in-bench
  * vs 2.11 s via TimeQ). So the run is split into [[ChunkSize]]-query
  * chunks and each chunk is timed in a FRESH JVM (the parent re-execs
  * itself with the same JVM flags and classpath, `--chunk n1,n2,…`). When
  * the fork cannot work — classpath not visible as plain files (sbt run),
  * or the child fails — the chunk falls back to an in-process run with a
  * fresh SparkSession, which resets the block manager and caches but not
  * the JVM, and the emitted line records which isolation each chunk got.
  *
  * The full per-query map is also WRITTEN TO THE REPO
  * ([[artifactPath]] + an append-only history line), because the driver
  * keeps only the tail of stdout and the alphabetical head of the map was
  * lost every round (VERDICT r8 missing #2).
  */
object Bench {

  /** Queries per isolated JVM. 29 keeps 5 forks for the 144-query surface
    * (VERDICT r16 next-step #6: 8 forks × ~15 s of JVM+session startup was
    * a fifth of the idle wall). The r9 isolation bar — no query runs after
    * ~80 prior evaluations in its process — still holds BECAUSE the quick
    * keys dropped to ~1 reading each (see [[quickAccept]]): a 29-key chunk
    * is ~29 warm-ups + ~22 quick×1 + ~7 slow×3 ≈ 72 evaluations, under the
    * 80 that chunk-size 20 × 4 evaluations used to reach.
    */
  private val ChunkSize = 29

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
    * blocking = true (ADVICE r8): an async eviction can still be running
    * when the next timed evaluation starts — the exact cross-query
    * interference the sweep exists to remove.
    */
  private[graft] def clearAllCaches(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  /** (steal, busy, total) jiffies from /proc/stat's aggregate cpu line —
    * busy = total − idle − iowait. Emitted as steal%-over-the-run (this
    * host is virtualized, and r3's driver total 157s vs a clean re-run 41s
    * was pure hypervisor steal — VERDICT r3 next-step #7) and, per chunk,
    * as the external-CPU signal behind the `degraded` flag (VERDICT r9
    * next-step #1: the r9 driver artifact recorded 247.5 s on a box whose
    * competing load an after-the-fact reader could not see per query).
    */
  private def cpuJiffies(): Option[(Long, Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val cols = src.getLines().find(_.startsWith("cpu "))
          .get.trim.split("\\s+").drop(1).map(_.toLong)
        val idle   = if (cols.length > 3) cols(3) else 0L
        val iowait = if (cols.length > 4) cols(4) else 0L
        Some((if (cols.length > 7) cols(7) else 0L, cols.sum - idle - iowait, cols.sum))
      } finally src.close()
    } catch { case _: Exception => None }

  /** This JVM's consumed CPU seconds (HotSpot's process-wide counter). */
  private def ownCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        math.max(0L, os.getProcessCpuTime) / 1e9
      case _ => 0.0
    }

  /** Load observed around ONE chunk: 1-min loadavg at chunk start, steal%
    * across the chunk, and the chunk's EXTERNAL cpu draw in cores — host
    * busy jiffies minus the cpu the bench itself (parent + forked child)
    * consumed, over the chunk's wall time. External cores are the signal
    * that actually detects a concurrent Verify/sbt/stress run: a loadavg
    * threshold alone is both laggy (1-min EMA) and polluted by the bench's
    * own work.
    */
  private[graft] final case class ChunkLoad(
      startLoad: Double, stealPct: Double, externalCores: Double,
      ioSomePct: Double = 0.0, ioFullPct: Double = 0.0,
      cpuSomePct: Double = 0.0, throttledPct: Double = 0.0,
      calibSec: Double = 0.0, calibParSec: Double = 0.0)

  /** Hot-chunk predicate (VERDICT r9 next-step #1). A chunk is hot when a
    * competing workload plausibly distorted its timings: external busy CPU
    * above a quarter of the machine, OR — for the FIRST chunk only — start
    * loadavg above 1.5× cores/4 (the run started into an already-saturated
    * box), OR hypervisor steal above 2%, OR (VERDICT r10 next-step #2) IO
    * pressure past a coarse floor — full-stall above 10% of the chunk's
    * wall (every non-idle task blocked on IO simultaneously: a CPU-bound
    * bench chunk cannot do that to itself) or some-stall above 40% (an
    * idle-box chunk here measures ~0; sustained heavy io_some is a
    * concurrent IO workload even when its CPU draw is invisible to
    * ext_cores), OR (VERDICT r14 next-step #1 — the r14 capture ran 2.6×
    * its clean band with every one of the above quiet) cpu-PSI some-stall
    * past [[CpuPsiHotPct]] ("runnable but not running" sees queueing
    * regardless of who the contender is; the floor sits well above the
    * bench's own local[N] oversubscription, measured single-digit on an
    * idle box), OR cgroup throttling past [[ThrottleHotPct]] of the
    * chunk's wall (a quota'd cgroup being throttled measures the quota,
    * not the plan), OR either of the chunk's fixed-work calibration probes
    * — single-thread ([[ChunkLoad.calibSec]] vs `calibRef`) or parallel
    * memory-streaming ([[ChunkLoad.calibParSec]] vs `calibParRef`,
    * VERDICT r16 next-step #3: the r16 driver run was ~2× inflated while
    * the single-thread probe read clean, because an ALU spin loop is blind
    * to the memory-bandwidth/LLC contention that hits 32-way parallel
    * execution; the parallel probe streams 1 GB over min(8,cores) threads
    * and measured 1.4–1.7× under 24 competing bandwidth threads on this
    * box, ±5 % idle) — past [[CalibHotRatio]]× its clean-history baseline.
    * The probes are the attribution-free sensors that catch whatever the
    * rest cannot name.
    *
    * VERDICT-ONLY triggers (`includeNonRetryable = false` at the retry
    * site): the IO pair — PSI is system-wide with no per-process
    * attribution, so on a slow-disk/cold-cache box the bench's OWN
    * first-chunk dataset read could trip them, and a retry cannot outwait
    * a slow disk — and cgroup throttling, which a static quota makes
    * permanent (retrying into the same quota burns the budget for
    * nothing). CPU-shaped signals (ext_cores, steal, loadavg, cpu-PSI,
    * calib) keep retrying: a transient competitor can vanish. The loadavg
    * trigger is first-chunk-only because from chunk 2 onward the 1-min
    * EMA is dominated by the bench's OWN prior-chunk work (≈ `cpus` cores
    * for minutes), so on hosts where cpus ≳ 1.5·cores/4 every later chunk
    * would self-flag hot on an idle machine; external cores already
    * subtract own CPU and carry the signal for those chunks. Thresholds
    * are deliberately coarse — the flag exists so a history consumer can
    * FILTER contaminated runs, not to rank load.
    */
  private[graft] def isHot(cl: ChunkLoad, cores: Int,
      firstChunk: Boolean = false, includeNonRetryable: Boolean = true,
      calibRef: Option[Double] = None,
      calibParRef: Option[Double] = None): Boolean =
    cl.externalCores > cores / 4.0 ||
      (firstChunk && cl.startLoad > 1.5 * cores / 4.0) ||
      cl.stealPct > 2.0 ||
      cl.cpuSomePct > CpuPsiHotPct ||
      calibRef.exists(r =>
        cl.calibSec > CalibHotRatio * r && cl.calibSec - r > CalibMinDeltaSec) ||
      calibParRef.exists(r =>
        cl.calibParSec > CalibHotRatio * r &&
          cl.calibParSec - r > CalibMinDeltaSec) ||
      (includeNonRetryable &&
        (cl.ioFullPct > 10.0 || cl.ioSomePct > 40.0 ||
          cl.throttledPct > ThrottleHotPct))

  /** cpu-PSI some-stall floor, % of the chunk's wall. An idle-box bench
    * chunk measures single digits (the bench's own local[N] session
    * briefly oversubscribes during shuffles and GC); a box whose runqueue
    * is systematically deeper than its cores — an invisible competitor, an
    * overcommitted hypervisor — sustains far more. Sits at 25% so the
    * bench's own bursts can never flag an idle box, while r14-grade
    * whole-window contention (everything 2.6× slow) clears it easily when
    * the contention is queueing-shaped at all.
    */
  private[graft] val CpuPsiHotPct = 25.0

  /** cgroup-throttle floor, % of the chunk's wall spent throttled. ANY
    * sustained throttling distorts timings (the chunk measures the quota,
    * not the plan), but sub-5% transients — a burst quota refilling — are
    * within the noise the median-of-3 repeats already absorb.
    */
  private[graft] val ThrottleHotPct = 5.0

  /** Calibration-probe inflation bar: a chunk (or run) whose fixed-work
    * probe reads past this ratio × the clean-history probe baseline is
    * hot. 1.5, not tier-1's 2.0: the probe is single-threaded fixed work
    * with no plan variance, so its clean spread is a few percent — 1.5×
    * is far outside noise while still catching moderate whole-window
    * contention (r14's 2.6× inflation would read ~2.6× here).
    */
  private[graft] val CalibHotRatio = 1.5
  /** …with an absolute floor so sub-50 ms jitter on a ~0.2 s probe can
    * never flag (same rationale as [[SuspectMinDeltaSec]]).
    */
  private[graft] val CalibMinDeltaSec = 0.05

  private def loadAvg1(): Option[Double] =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try Some(src.getLines().next().split("\\s+")(0).toDouble)
      finally src.close()
    } catch { case _: Exception => None }

  /** Cumulative cgroup CPU-throttle time in µs, across the v2 and v1
    * layouts (VERDICT r14 next-step #1): a quota'd cgroup being throttled
    * slows every timed query while busy jiffies, steal, loadavg and PSI-io
    * all read idle — exactly the invisible-contention signature of the r14
    * capture. v2 publishes `throttled_usec` in `cpu.stat`; hybrid hosts
    * mount v2 under `unified/`; v1 publishes `throttled_time` in
    * NANOseconds. None where no layout carries the counter (no cpu
    * controller, or no quota ever set — v1 files then read 0, which is a
    * valid Some(0): deltas stay 0 and the trigger never fires).
    */
  private def throttledUsec(): Option[Long] = {
    def read(path: String, key: String, perUsec: Long): Option[Long] =
      try {
        val p = java.nio.file.Paths.get(path)
        if (!java.nio.file.Files.isRegularFile(p)) None
        else java.nio.file.Files.readString(p).linesIterator
          .map(_.trim.split("\\s+"))
          .collectFirst { case Array(k, v) if k == key => v.toLong / perUsec }
      } catch { case _: Exception => None }
    read("/sys/fs/cgroup/cpu.stat", "throttled_usec", 1L)
      .orElse(read("/sys/fs/cgroup/unified/cpu.stat", "throttled_usec", 1L))
      .orElse(read("/sys/fs/cgroup/cpu/cpu.stat", "throttled_time", 1000L))
  }

  /** Fixed-work single-thread CPU probe: ~67M integer mix rounds, timed.
    * The one sensor that needs NO attribution model (VERDICT r14 next-step
    * #2): whatever steals cycles — an invisible-to-steal hypervisor cap,
    * cgroup throttling, frequency scaling, an unaccounted competitor —
    * slows this loop in the same proportion it slows the timed queries,
    * so comparing the probe to its own clean-history baseline adjudicates
    * contention even when every attribution-based sensor (ext_cores,
    * steal, PSI) reads idle, which is byte-for-byte the r14 capture. The
    * result feeds [[ChunkLoad.calibSec]]; the loop's value is folded into
    * a volatile sink so JIT cannot dead-code it. Callers warm it once
    * (see main) so chunk 0 never pays the C2-compile of the loop itself.
    */
  @volatile private var calibSink = 0L
  private[graft] def calibProbe(): Double = {
    val t0 = System.nanoTime()
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < (1 << 26)) {
      h = java.lang.Long.rotateLeft(h * 0x100000001B3L, 31) ^ (h >>> 17)
      i += 1
    }
    calibSink = h
    math.round((System.nanoTime() - t0) / 1e9 * 1000) / 1000.0
  }

  /** Fixed-work PARALLEL memory-streaming probe (VERDICT r16 next-step
    * #3): min(8, cores) threads each xor-fold 16 sequential passes over a
    * shared read-only 64 MB long array (1 GB of reads total), timed by
    * wall clock. The single-thread [[calibProbe]] is an ALU spin loop —
    * structurally blind to memory-bandwidth/LLC contention, which is
    * exactly how the r16 driver capture ran ~2× slow with
    * `calib_inflated:false` and every attribution sensor quiet. This probe
    * contends for the same shared resources 32-way query execution does:
    * measured on this box, ±5 % spread idle (steady 0.077–0.085 s) and
    * 1.4–1.7× under 24 competing bandwidth threads, so [[CalibHotRatio]] ×
    * a clean-history median separates cleanly. The array is allocated and
    * filled once (deterministic LCG content — the values only have to
    * defeat zero-page mapping) and each thread starts at its own offset so
    * threads do not ride one cache line train. Same volatile-sink rule as
    * the scalar probe; callers warm it once so chunk 0 never pays the
    * allocation + first-touch + C2 compile.
    */
  private val CalibParWords = 1 << 23 // 8M longs = 64 MB shared
  private lazy val calibParArr: Array[Long] = {
    val a = new Array[Long](CalibParWords)
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < a.length) { h = h * 0x100000001B3L ^ (h >>> 17); a(i) = h; i += 1 }
    a
  }
  private[graft] def calibProbePar(): Double = {
    val arr = calibParArr
    val threads = math.min(8, Runtime.getRuntime.availableProcessors)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val off = (arr.length / threads) * t
      val th = new Thread(() => {
        var s = 0L
        var pass = 0
        while (pass < 16) {
          var i = 0
          while (i < arr.length) {
            s ^= arr((i + off) & (arr.length - 1))
            i += 1
          }
          pass += 1
        }
        calibSink = s
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    math.round((System.nanoTime() - t0) / 1e9 * 1000) / 1000.0
  }

  /** Cumulative PSI stall totals in µs for one resource from
    * `/proc/pressure/<res>` — (someTotal, fullTotal). PSI sees what
    * loadavg/ext_cores structurally cannot (VERDICT r10 next-step #2, the
    * exact r10 failure mode): D-state and IO-wait contention never shows
    * in busy jiffies, and the loadavg EMA is both laggy and polluted by
    * the bench's own work. None where the kernel lacks PSI (pre-4.20 or
    * psi=0) — the io fields then read 0.0, never an error.
    */
  private def psiTotals(res: String): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile(s"/proc/pressure/$res")
      try {
        val totals = src.getLines().flatMap { l =>
          val cols = l.trim.split("\\s+")
          for {
            kind <- cols.headOption
            t    <- cols.find(_.startsWith("total="))
          } yield kind -> t.substring(6).toLong
        }.toMap
        totals.get("some").map(s => (s, totals.getOrElse("full", 0L)))
      } finally src.close()
    } catch { case _: Exception => None }

  /** Minimal JSON string escape for builder-controlled content (query
    * names, whitespace-collapsed error text). Shared with the streaming
    * smoke so the two artifact writers cannot drift on the escaping rule.
    */
  private[graft] def jstr(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** One timed query result: median-of-3 seconds (−1 on failure), the
    * first error message if any repeat failed, and — for the
    * [[PhasedQueries]] composites — the phase split of one DEDICATED
    * untimed evaluation run after the repeats. Phases are diagnostic
    * sub-timings, never a partition of the median: the capture evaluation
    * may execute a different physical shape than the timed lazy plan (the
    * crossmodal composite materializes its sides eagerly under capture,
    * which measured ~2× its lazy wall — the reason the timed repeats are
    * capture-free), so compare phases to PHASES across rounds and totals
    * to totals, never one to the other.
    *
    * `stealPct` (r15): hypervisor steal across THIS query's three timed
    * repeats. Chunk-level load averaging has a structural blind spot for
    * BURST contention — a 2-second 100 % steal burst inside a 3-minute
    * chunk averages ~1 % (under every threshold) yet makes a 0.4 s query
    * read 18× (observed twice in the r15 trail: q_asof_join 8.1 s vs a
    * 0.42 s median with chunk steal 0.5–1.4 %, all sensors quiet, fresh-JVM
    * retime normal). The per-query window is short enough that a burst
    * landing on the query IS visible in its own steal number — diagnostic
    * context for the suspect flags, never an input to the verdicts.
    */
  private[graft] final case class Timed(name: String, secs: Double,
      err: Option[String], phases: Seq[(String, Double)] = Nil,
      stealPct: Double = 0.0)

  /** The queries that self-attribute phase splits under a
    * [[graft.Phases]] capture. Only these pay the extra diagnostic
    * evaluation — it rides the bench's wall clock, never `queries[k]` —
    * and the TIMED repeats run capture-free so every published total is
    * the plain lazy plan's (VERDICT r11 #3's "totals unchanged" clause:
    * in-repeat capture held that for the ANN pair, whose timed stages are
    * driver-eager under either mode, but not for the crossmodal
    * composite, whose capture mode inserts persist+count barriers).
    */
  private[graft] val PhasedQueries: Set[String] =
    Set("q_ann_ivfpq", "q_pq_adc", "q_crossmodal_dups", "q_hybrid_rrf",
      "q_semdedup", "q_containment_pairs",
      // VERDICT r13 next-step #5 — the iterative graph family: dup_clusters
      // self-attributes for free (the contraction is driver-eager);
      // reach_hops uses the capture-gated count pattern
      "q_dup_clusters", "q_reach_hops",
      // VERDICT r14 next-step #5 — the last two ≥2 s-median keys without
      // stage attribution, both on the capture-gated count pattern
      "q_pagerank", "q_dup_span_coverage")

  // ---- wall-clock self-deadline + cost controls (VERDICT r15) ------------
  //
  // r15's driver bench invocation died at the driver's own finite wall
  // cap (rc 124, `parsed: null`, stdout tail = Spark startup logs): the
  // bench capped its streaming-smoke CHILD at 600 s but nothing bounded
  // the RUN, so every closing-line guarantee was conditional on the
  // process reaching its own epilogue. Three layered defenses:
  //  1. an internal deadline checked between chunks (and before the
  //     retime pass and the smoke) — when it trips, everything un-run is
  //     SKIPPED with visible skip records and the closing sequence prints
  //     immediately (`deadline_hit:true`, run stamped degraded);
  //  2. a degrade ladder — when the measured pace projects past the
  //     deadline, remaining chunks drop to repeats=1 and skip the phase
  //     evaluations (stamped `ladder:true` + degraded, never silent);
  //  3. a provisional cumulative closing line after every chunk (the
  //     `partial:true` stamp on [[closingTotalLine]]), so even a kill the
  //     bench cannot see leaves a parseable record in the stdout tail.

  /** Internal wall-clock budget (seconds), `GRAFT_BENCH_DEADLINE_SEC`.
    * Default 1200: the r13/r14 driver invocations COMPLETED (rc 0), so the
    * driver's unknown cap sits above their ~12–25-minute walls, and the
    * r16 idle protocol measures well under 1200 s — the default clears an
    * idle run with margin while cutting a contended run's tail before
    * whatever finite cap killed r15 can. Junk / non-positive values fall
    * back to the default (a zero budget would skip the whole surface).
    */
  private[graft] val DefaultDeadlineSec = 1200.0
  private[graft] def benchDeadlineSec(env: Option[String]): Double =
    // isFinite too (ADVICE r16 #1): toDoubleOption accepts "Infinity" and
    // overflow literals like "1e400", which pass `> 0` and then render as
    // the bare token `Infinity` in budgetFields — invalid JSON on the very
    // lines whose parseability is the whole contract
    env.flatMap(_.trim.toDoubleOption).filter(d => d > 0 && d.isFinite)
      .getOrElse(DefaultDeadlineSec)

  /** Ladder decision: with `done` of `total` chunks finished in
    * `elapsedSec`, does the measured per-chunk pace project the remaining
    * chunks past `remainingSec`? Once true the run degrades (repeats=1, no
    * phase evaluations, ~2.5× cheaper per chunk) for everything still
    * un-run — a stamped degrade beats both a silent overshoot into the
    * driver's kill and an unnecessarily early skip.
    */
  private[graft] def ladderNeeded(done: Int, total: Int,
      elapsedSec: Double, remainingSec: Double): Boolean =
    done > 0 && total > done &&
      elapsedSec / done * (total - done) > remainingSec

  /** Keys timed with the ADAPTIVE estimator instead of median-of-3:
    * clean-history median under this bar (VERDICT r15 next-step #3). The
    * capture protocol paid 4 evaluations per query for a 119 s metric
    * (~12 idle minutes); sub-second keys are ~110 of the 144 yet only
    * ~47 s of that metric, and they are noise-floor for the suspect
    * machinery — the ≥1 s keys, where the per-query history verdicts do
    * real work, keep the full median-of-3.
    *
    * r16 used MIN-of-2 (a burst must hit both readings to publish); r17
    * (VERDICT r16 next-step #6, cutting the idle wall) tightens it to
    * ADAPTIVE min-of-2 via [[quickAccept]]: ONE post-warm-up reading,
    * published directly when it lands inside the plausibility band of the
    * key's own clean median ([[QuickAcceptRatio]]× + [[QuickAcceptSlackSec]]);
    * a second reading (publish the min of the two) only when it does not.
    * The burst defense is STRONGER than plain min-of-2, not weaker: an
    * accepted single reading is BY CONSTRUCTION within 1.3×median+0.05 s
    * — a steal burst (the 18× q_asof_join shape) can never accept — while
    * a rejected first reading falls back to exactly the r16 estimator.
    * A published quick value can therefore only exceed its band when BOTH
    * readings did (real regression, or a burst landing on both), at ~1
    * evaluation per quiet-box key instead of 2. The map carries each quick
    * key's median so the CHILD JVM can apply the accept test; a first run
    * (no medians yet) times everything at median-of-3.
    */
  private[graft] val QuickMedianSec = 1.0
  private[graft] val QuickAcceptRatio = 1.3
  private[graft] val QuickAcceptSlackSec = 0.05
  private[graft] def quickKeys(names: Seq[String],
      medians: Map[String, Double]): Map[String, Double] =
    names.flatMap(n => medians.get(n).filter(_ < QuickMedianSec).map(n -> _))
      .toMap

  /** The adaptive-quick accept test: is one reading plausible against the
    * key's own clean-history median? Shared by the child timing loop and
    * the spec so the estimator cannot drift from its documentation.
    */
  private[graft] def quickAccept(reading: Double, median: Double): Boolean =
    reading <= QuickAcceptRatio * median + QuickAcceptSlackSec

  /** Rotate the chunk order by `seed` (VERDICT r16 next-step #1): chunks
    * were built — and run — in sorted-key order, so a deadline trip always
    * starved the SAME alphabetical tail (r16's driver run skipped exactly
    * the 4 sorted-last keys, and every future contended run would re-skip
    * them: their driver timings could go stale indefinitely). Rotating the
    * START OFFSET per run — seeded from the history length, which grows by
    * one per completed run — keeps each run fully deterministic (same
    * tree + same history ⇒ same order) while moving the skip burden across
    * the surface run-over-run. Within-chunk composition and order are
    * untouched, so per-chunk warm-up attribution stays comparable.
    */
  private[graft] def rotatedChunks[A](chunks: Seq[Seq[A]], seed: Int): Seq[Seq[A]] =
    if (chunks.size <= 1) chunks
    else {
      val k = ((seed % chunks.size) + chunks.size) % chunks.size
      chunks.drop(k) ++ chunks.take(k)
    }

  /** Streaming-smoke budget reserve (VERDICT r16 next-step #2): r16's
    * driver artifact had NO streaming evidence — the smoke was the first
    * casualty of the deadline (`STREAMING.json` = "skipped: bench
    * deadline") to save ~45 s of a 1200 s budget. The smoke now runs
    * MID-RUN the moment the remaining budget first drops inside
    * [[[SmokeMinRemainSec]], [[SmokeReserveSec]]) — before the last chunks
    * spend it — so a contended run trades ~one timed chunk for the round's
    * only driver-side streaming adjudication. On a clean run the budget
    * never drops below the reserve before the chunks finish and the smoke
    * runs at the end exactly as before. Below [[SmokeMinRemainSec]] the
    * smoke cannot finish anyway (idle ~45 s incl. fork) and the explicit
    * deadline skip record remains the honest output.
    */
  private[graft] val SmokeReserveSec = 180.0
  private[graft] val SmokeMinRemainSec = 60.0

  /** Is this between-chunks instant the time to spend the reserve? Two
    * triggers, both requiring the smoke to still be runnable
    * (`remainingSec >= minSec`): the remaining budget is already inside
    * the reserve window, OR — pace-predictive — the projected next chunk
    * would land it BELOW [[SmokeMinRemainSec]], i.e. straight over the
    * window. The second trigger exists because the check only runs
    * between chunks and a contended chunk's wall (~250 s at 2×
    * contention) is wider than the 120 s static window: a run could sit
    * at remaining=190 s (not due), spend 250 s on one chunk, and wake at
    * remaining<60 s with the smoke unrunnable — exactly the r16
    * starvation this reserve was built to end. `projectedChunkSec` is
    * the same measured-pace estimator [[ladderNeeded]] uses (0 before
    * any chunk has finished, which disables the predictive trigger, not
    * the static one). A projection landing in [minSec, reserve) stays
    * NOT due: the next between-chunks check catches it inside the
    * window, and the chunks keep their budget priority.
    */
  private[graft] def smokeDueNow(remainingSec: Double,
      projectedChunkSec: Double = 0.0,
      reserve: Double = SmokeReserveSec,
      minSec: Double = SmokeMinRemainSec): Boolean =
    remainingSec >= minSec &&
      (remainingSec < reserve || remainingSec - projectedChunkSec < minSec)

  /** Chunk size override (`GRAFT_BENCH_CHUNK_SIZE`) — dev/e2e plumbing
    * only, never set by the driver: the deadline/kill e2e needs a run with
    * >1 chunk over a 4-query subset. Junk / non-positive → [[ChunkSize]].
    */
  private[graft] def chunkSizeFromEnv(env: Option[String]): Int =
    env.flatMap(_.trim.toIntOption).filter(_ > 0).getOrElse(ChunkSize)

  /** Warm up then time one chunk of queries against an OWNED SparkSession
    * (created and stopped here). Median of 3 post-warm-up repeats per query
    * (VERDICT r5 next-step #5): this host is virtualized, and a single-shot
    * number conflates the plan with whatever the hypervisor was doing that
    * second — except for `quick` keys (clean-history median under
    * [[QuickMedianSec]], carried WITH their medians), which take ONE
    * post-warm-up reading published directly when [[quickAccept]] holds
    * against the key's own median, else a second reading and the min of
    * the two (see [[quickKeys]] for why this is burst-robust), and
    * ladder-degraded chunks (`repeats`=1), where everything takes its one
    * reading. ANY failed repeat marks the query failed (−1 + error): an
    * aggregate over surviving repeats would print a healthy-looking
    * number for a flaky query.
    */
  private def runChunk(names: Seq[String], sfDir: String, cpus: String,
      repeats: Int = 3, quick: Map[String, Double] = Map.empty,
      phasesEnabled: Boolean = true): Seq[Timed] = {
    val spark = LocalSpark.session(cpus, "graft-bench")
    try {
      def force(name: String): Option[String] =
        try {
          forceFrame(SparkEntry.queries(name)(spark, sfDir))
          None
        } catch { case e: Throwable =>
          Some(e.toString.replaceAll("\\s+", " ").take(300))
        }
      // warm-up: classloading, codegen, parquet footers (cache-swept like
      // the timed loop — warm-up leaks pollute the timed numbers identically)
      names.foreach { n => clearAllCaches(spark); force(n) }
      names.map { name =>
        val isQuick = repeats != 1 && quick.contains(name)
        // per-query steal window (see Timed.stealPct): jiffies around the
        // timed repeats — a burst that lands on this query shows here even
        // when the chunk-average stays under every threshold
        val j0 = cpuJiffies()
        def oneTimed(): (Double, Option[String]) = {
          // drop caches persisted by OTHER queries' evaluation AND by this
          // query's own previous repeat: each timed number must measure the
          // query's own full pipeline. Intra-query persists still apply.
          // NO capture here: a capture-sensitive composite must never let
          // its diagnostic shape contaminate the published total.
          clearAllCaches(spark)
          val t0 = System.nanoTime()
          val err = force(name)
          (if (err.isEmpty) (System.nanoTime() - t0) / 1e9 else -1.0, err)
        }
        val runs: Seq[(Double, Option[String])] =
          if (isQuick) {
            // adaptive min-of-2 (see quickKeys): a reading inside the
            // key's own plausibility band publishes alone; a rejected one
            // gets the full min-of-2 fallback — a burst can never accept
            val r1 = oneTimed()
            if (r1._2.isEmpty && !quickAccept(r1._1, quick(name)))
              Seq(r1, oneTimed())
            else Seq(r1)
          } else (1 to (if (repeats == 1) 1 else repeats)).map(_ => oneTimed())
        val qSteal =
          (for ((s0, _, t0) <- j0; (s1, _, t1) <- cpuJiffies() if t1 > t0)
            yield math.round((s1 - s0) * 1000.0 / (t1 - t0)) / 10.0)
            .getOrElse(0.0)
        val err = runs.flatMap(_._2).headOption
        val ok  = runs.map(_._1).filter(_ >= 0)
        // quick keys publish the accepted reading or the MIN of their two
        // (additive-positive noise ⇒ min is the robust estimator;
        // sorted(len/2) would pick the MAX of a pair); others the median
        val median =
          if (ok.isEmpty) -1.0
          else if (isQuick) ok.min
          else ok.sorted.apply(ok.length / 2)
        err.foreach(m => System.err.println(s"[bench] $name FAILED: $m"))
        // the phase split comes from ONE dedicated untimed evaluation —
        // see [[PhasedQueries]]; a failure here only costs the split.
        // Skipped under the deadline ladder (phasesEnabled=false): phases
        // are diagnostics, and a run racing its budget spends wall on
        // timings first.
        val phases =
          if (err.isEmpty && phasesEnabled && PhasedQueries(name)) {
            clearAllCaches(spark)
            Phases.capture(force(name)) match {
              case (None, ph) => ph
              case _          => Nil
            }
          } else Nil
        Timed(name, if (err.isEmpty) median else -1.0, err, phases, qSteal)
      }
    } finally spark.stop()
  }

  /** Child-mode entry: time the named queries in THIS JVM and print ONE
    * easily-parsed line per query (`GRAFT_Q name seconds [error…]`) — a
    * deliberately trivial wire format, because error strings may contain
    * any JSON-hostile character and a chunk the parent cannot parse would
    * silently re-run in-process, losing the isolation. A final `GRAFT_CPU`
    * line reports the child's consumed CPU seconds, which the parent
    * subtracts from the host's busy CPU to isolate EXTERNAL load (the
    * per-chunk hot/degraded signal).
    */
  /** One timed result as its child-wire lines — split from [[childMain]]
    * so the wire format and [[parseChunk]] can be property-tested as a
    * round-trip (the fork isolation depends on this parse: a child line
    * the parent cannot read silently demotes the chunk to the in-process
    * fallback, losing the fresh-JVM isolation with no visible failure).
    */
  private[graft] def childLines(t: Timed): Seq[String] = {
    // phase names are code-controlled identifiers (no spaces/semicolons),
    // so `name=secs;name=secs` parses with two splits — same philosophy
    // as GRAFT_Q: trivially parseable, JSON-hostile-content-proof
    val ph =
      if (t.phases.nonEmpty)
        Seq(s"GRAFT_PH ${t.name} " +
          t.phases.map { case (p, v) => s"$p=$v" }.mkString(";"))
      else Nil
    // the query's own steal window (r15, burst-contention context) — its
    // own line, because GRAFT_Q's 4th token is reserved for error text
    val qs = if (t.stealPct > 0.0) Seq(s"GRAFT_QS ${t.name} ${t.stealPct}") else Nil
    // error text is already whitespace-collapsed by the catch site
    ph ++ qs :+ (s"GRAFT_Q ${t.name} ${t.secs}" +: t.err.toSeq).mkString(" ")
  }

  /** The quick-key argv payload (`name=medianSecs,…`) and its inverse —
    * the medians ride the wire because the CHILD applies [[quickAccept]];
    * names are code-controlled identifiers and the medians are code-
    * rendered doubles, so two splits parse it (the GRAFT_Q philosophy).
    */
  private[graft] def quickCsvOf(quick: Map[String, Double],
      names: Seq[String]): String =
    names.filter(quick.contains).map(n => s"$n=${quick(n)}").mkString(",")
  private[graft] def parseQuickCsv(csv: String): Map[String, Double] =
    csv.split(',').toSeq.filter(_.contains("=")).flatMap { kv =>
      val i = kv.indexOf('=')
      kv.substring(i + 1).toDoubleOption.map(kv.substring(0, i) -> _)
    }.toMap

  private def childMain(csv: String, sfDir: String, cpus: String,
      repeats: Int, phasesEnabled: Boolean, quickCsv: String): Unit = {
    runChunk(csv.split(',').toSeq.filter(_.nonEmpty), sfDir, cpus, repeats,
      parseQuickCsv(quickCsv), phasesEnabled)
      .foreach(t => childLines(t).foreach(println))
    println(s"GRAFT_CPU ${ownCpuSec()}")
  }

  /** Parse one `GRAFT_PH` payload (`phase=secs;phase=secs`). */
  private[graft] def parsePhases(payload: String): Seq[(String, Double)] =
    payload.split(';').toSeq.filter(_.contains("=")).map { kv =>
      val i = kv.indexOf('=')
      (kv.substring(0, i), kv.substring(i + 1).toDouble)
    }

  /** Parse a child's `GRAFT_Q` lines (+ its `GRAFT_CPU` self-report). None
    * (→ in-process fallback) unless EVERY requested query reported.
    * private[graft]: property-tested as [[childLines]]' round-trip inverse.
    */
  private[graft] def parseChunk(out: String, names: Seq[String]): Option[(Seq[Timed], Double)] =
    try {
      val phases = out.linesIterator.filter(_.startsWith("GRAFT_PH ")).map { l =>
        val parts = l.split(" ", 3)
        parts(1) -> (if (parts.length >= 3) parsePhases(parts(2)) else Nil)
      }.toMap
      val steals = out.linesIterator.filter(_.startsWith("GRAFT_QS ")).map { l =>
        val parts = l.split(" ", 3)
        parts(1) -> parts(2).toDouble
      }.toMap
      val rows = out.linesIterator.filter(_.startsWith("GRAFT_Q ")).map { l =>
        val parts = l.split(" ", 4)
        val err = if (parts.length >= 4 && parts(3).nonEmpty) Some(parts(3)) else None
        parts(1) -> Timed(parts(1), parts(2).toDouble, err,
          phases.getOrElse(parts(1), Nil), steals.getOrElse(parts(1), 0.0))
      }.toMap
      val cpu = out.linesIterator.find(_.startsWith("GRAFT_CPU "))
        .map(_.split(" ")(1).toDouble).getOrElse(0.0)
      if (names.forall(rows.contains)) Some((names.map(rows), cpu)) else None
    } catch { case _: Exception => None }

  /** Fork a fresh JVM for one chunk: same java binary, same JVM args
    * (-Xmx, --add-opens, -D flags), same classpath, `--chunk` mode. Returns
    * None when the fork is impossible or the child's output is unusable —
    * the caller then runs the chunk in-process.
    */
  /** ProcessBuilder for a child JVM running `mainClass args…` with THIS
    * JVM's flags (-Xmx, --add-opens, -D) and classpath — the fork plumbing
    * shared by the chunk isolation and the streaming smoke (one copy, so a
    * fix to e.g. the agent-flag filter reaches both). None when the graft
    * classes are not reachable as plain files (the sbt-launcher classpath),
    * where a child could never start — callers fall back or skip.
    */
  private def childJvm(mainClass: String, args: Seq[String]): Option[ProcessBuilder] = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    // getClass on the companion object is already "graft.Bench$"
    val probe = getClass.getName.replace('.', '/') + ".class"
    val cl = new java.net.URLClassLoader(
      cp.split(java.io.File.pathSeparator).filter(_.nonEmpty)
        .map(p => new java.io.File(p).toURI.toURL))
    val reachable = try cl.findResource(probe) != null finally cl.close()
    if (!reachable) return None
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments
    val cmd = new java.util.ArrayList[String]()
    cmd.add(javaBin)
    jvmArgs.forEach(a => if (!a.startsWith("-agentlib")) { cmd.add(a); () })
    cmd.add("-cp"); cmd.add(cp)
    cmd.add(mainClass); args.foreach(cmd.add(_))
    val pb = new ProcessBuilder(cmd)
    // stderr routing is the CALLER's job (r16). It used to inherit the
    // console, but the driver reads a merged fixed-size stdout+stderr
    // tail — a kill landing during a child's ~20-line Spark startup spew
    // would push the provisional closing lines out of that window, the
    // exact r8–r11 parsed:null shape resurrected one layer down. Both
    // callers now divert child stderr to a temp file and replay its tail
    // to the parent's stderr only on failure.
    Some(pb)
  }

  /** Tail of a child's diverted stderr, replayed to the parent's stderr —
    * only ever called on a FAILED child, so diagnostics survive without
    * the success-path spew contaminating the driver's merged tail.
    */
  private def replayChildStderr(errFile: java.nio.file.Path, what: String): Unit =
    try {
      val tail = java.nio.file.Files.readString(errFile)
        .linesIterator.toSeq.takeRight(30)
      if (tail.nonEmpty) {
        System.err.println(s"[bench] $what child stderr tail:")
        tail.foreach(System.err.println)
      }
    } catch { case _: Exception => }

  private def forkChunk(names: Seq[String], repeats: Int,
      quick: Map[String, Double], phasesEnabled: Boolean): Option[(Seq[Timed], Double)] =
    try {
      // the chunk protocol rides argv (not env): repeats, phase flag, and
      // the chunk's quick-key subset with medians — all builder-controlled
      childJvm("graft.Bench", Seq("--chunk", names.mkString(","),
        repeats.toString, if (phasesEnabled) "1" else "0",
        quickCsvOf(quick, names))).flatMap { pb =>
        val errFile = java.nio.file.Files.createTempFile("graft-chunk", ".err")
        try {
          pb.redirectError(errFile.toFile)
          val proc = pb.start()
          val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
          val rc = proc.waitFor()
          val parsed =
            if (rc != 0) { System.err.println(s"[bench] fork rc=$rc"); None }
            else parseChunk(out, names)
          // a chunk that failed or could not be parsed gets its diverted
          // stderr replayed (then falls back in-process); a healthy chunk's
          // Spark spew never reaches the driver's merged tail
          if (parsed.isEmpty) replayChildStderr(errFile, "chunk")
          parsed
        } finally { java.nio.file.Files.deleteIfExists(errFile); () }
      }
    } catch { case e: Exception =>
      System.err.println(s"[bench] fork failed: ${e.toString.take(200)}"); None
    }

  /** Time one chunk (forked when possible, in-process otherwise) and
    * measure the load around it: loadavg at start, steal% across it, and
    * external CPU cores (host busy minus the bench's own parent+child CPU,
    * per wall second). USER_HZ is 100 on every Linux this runs on.
    */
  private def timeChunk(names: Seq[String], sfDir: String,
      cpus: String, repeats: Int = 3, quick: Map[String, Double] = Map.empty,
      phasesEnabled: Boolean = true): (Seq[Timed], Boolean, ChunkLoad) = {
    // each attempt gets its OWN measurement window: a fork whose child died
    // mid-chunk would otherwise leave its burned CPU inside the fallback's
    // window with childCpu unreported (the GRAFT_CPU line never printed),
    // mis-attributing the dead child's own work to external load
    def measured[A](work: => (A, Double)): (A, ChunkLoad) = {
      // the calibration probes run BEFORE the measurement window: they
      // sample the box's effective single-thread speed and parallel
      // memory bandwidth at chunk start (attribution-free — see
      // calibProbe/calibProbePar), and keeping their ~0.3 s out of the
      // window keeps ext_cores/PSI attribution about the chunk itself
      val calib = calibProbe()
      val calibPar = calibProbePar()
      val load0   = loadAvg1().getOrElse(0.0)
      val j0      = cpuJiffies()
      val psiIo0  = psiTotals("io")
      val psiCpu0 = psiTotals("cpu")
      val thr0    = throttledUsec()
      val own0    = ownCpuSec()
      val t0      = System.nanoTime()
      val (res, childCpu) = work
      val elapsed = math.max(0.001, (System.nanoTime() - t0) / 1e9)
      val ownSec  = math.max(0.0, ownCpuSec() - own0) + childCpu
      val (stealPct, extCores) =
        (for ((s0, b0, tt0) <- j0; (s1, b1, tt1) <- cpuJiffies()) yield {
          val steal = if (tt1 > tt0) (s1 - s0) * 100.0 / (tt1 - tt0) else 0.0
          val busySec = math.max(0L, b1 - b0) / 100.0
          (steal, math.max(0.0, busySec - ownSec) / elapsed)
        }).getOrElse((0.0, 0.0))
      // PSI totals are cumulative stall µs: delta/1e6 = stalled seconds
      // over the chunk, /elapsed·100 = percent of the chunk's wall → /1e4
      def psiPct(before: Option[(Long, Long)], res: String): (Double, Double) =
        (for ((s0, f0) <- before; (s1, f1) <- psiTotals(res)) yield
          (math.max(0L, s1 - s0) / 1e4 / elapsed,
            math.max(0L, f1 - f0) / 1e4 / elapsed)).getOrElse((0.0, 0.0))
      val (ioSome, ioFull) = psiPct(psiIo0, "io")
      // cpu-PSI full is 0 at system scope by kernel design; some carries
      // the runnable-but-not-running signal (VERDICT r14 next-step #1)
      val (cpuSome, _) = psiPct(psiCpu0, "cpu")
      val throttled =
        (for (a <- thr0; b <- throttledUsec()) yield
          math.max(0L, b - a) / 1e4 / elapsed).getOrElse(0.0)
      def r2(x: Double) = math.round(x * 100) / 100.0
      (res, ChunkLoad(load0, r2(stealPct), r2(extCores), r2(ioSome),
        r2(ioFull), r2(cpuSome), r2(throttled), calib, calibPar))
    }
    val (forkRes, forkLoad) = measured {
      forkChunk(names, repeats, quick, phasesEnabled) match {
        case Some((t, cpu)) => (Some(t), cpu)
        case None           => (None, 0.0)
      }
    }
    forkRes match {
      case Some(t) => (t, true, forkLoad)
      case None =>
        val (t, fbLoad) = measured(
          (runChunk(names, sfDir, cpus, repeats, quick, phasesEnabled), 0.0))
        (t, false, fbLoad)
    }
  }

  /** The per-chunk load block + run-level degraded flag for the emitted
    * line — split out so a spec can feed synthetic loads and parse the
    * result (the r9 failure mode was an artifact READER trusting a number
    * the bench knew was contaminated; the contract under test is the JSON
    * itself). The verdict applies the SAME first-chunk loadavg trigger the
    * retry decision uses — without it, IO-heavy competing load (high
    * loadavg from D-state work that never shows in busy jiffies, so
    * ext_cores stays low) could distort chunk 0 twice yet publish as
    * clean. After a chunk-0 retry the emitted load is the accepted
    * attempt's, whose loadavg includes the bench's own first-attempt work
    * (~`cpus` child cores — far under 1.5·cores/4 here), so the residual
    * bias is toward flagging: the cheap direction for a filter flag.
    */
  private[graft] def loadFieldsJson(chunkLoads: Seq[ChunkLoad], cores: Int,
      runSteal: Option[Double], runLoad: Option[Double],
      calibRef: Option[Double] = None,
      calibParRef: Option[Double] = None): (String, Boolean) = {
    val hot = chunkLoads.zipWithIndex.map { case (c, i) =>
      isHot(c, cores, firstChunk = i == 0, calibRef = calibRef,
        calibParRef = calibParRef)
    }
    val degraded = hot.contains(true)
    val perChunk = chunkLoads.zip(hot).map { case (c, h) =>
      s"""{"load":${c.startLoad},"steal_pct":${c.stealPct},""" +
        s""""ext_cores":${c.externalCores},"io_some_pct":${c.ioSomePct},""" +
        s""""io_full_pct":${c.ioFullPct},"cpu_some_pct":${c.cpuSomePct},""" +
        s""""throttled_pct":${c.throttledPct},"calib_sec":${c.calibSec},""" +
        s""""calib_par_sec":${c.calibParSec},"hot":$h}"""
    }.mkString("[", ",", "]")
    val run = runSteal.map(s => s""""steal_pct":$s""").toSeq ++
      runLoad.map(l => s""""loadavg1":$l""").toSeq ++
      // the clean-history probe baselines the calib triggers judged
      // against (absent on a first run / thin history) — published so an
      // artifact reader can recompute every chunk's calib verdict
      calibRef.map(r => s""""calib_ref":$r""").toSeq ++
      calibParRef.map(r => s""""calib_par_ref":$r""").toSeq :+
      s""""cores":$cores""" :+ s""""chunk_load":$perChunk"""
    (run.mkString("{", ",", "}"), degraded)
  }

  // ---- history-aware per-query plausibility (VERDICT r10 next-step #1) --
  //
  // The external-load machinery above measures CPU-shaped contention; the
  // r10 driver capture proved cache/IO-shaped variance passes it clean
  // (degraded:false while 7 unchanged queries read 2–9× their idle
  // medians). The history check closes that blind spot from the other
  // side: each query's timing is compared to ITS OWN median over the last
  // clean history entries, and a run where several TRIVIAL queries inflate
  // together is stamped suspect — one plan change cannot touch unrelated
  // one-scan queries at once, so co-inflation is contention by definition.

  /** Clean entries consulted from the tail of BENCH_HISTORY.jsonl. */
  private[graft] val SuspectHistoryWindow = 5
  /** A query needs this many clean samples before it can be judged. */
  private[graft] val SuspectMinSamples = 3
  /** Per-query flag: > ratio × its history median… */
  private[graft] val SuspectRatio = 2.0
  /** …AND more than this many seconds above it (sub-100 ms jitter on a
    * 50 ms query is noise, not contention).
    */
  private[graft] val SuspectMinDeltaSec = 0.1
  /** A query is "trivial" below this median — too simple to regress big. */
  private[graft] val TrivialMedianSec = 0.5
  /** Run-level suspect: at least this many trivial queries inflated. */
  private[graft] val CoInflateCount = 3
  /** Second-tier eligibility (VERDICT r13 next-step #3): non-trivial
    * queries above this median…
    */
  private[graft] val ModerateMedianSec = 0.4
  /** …past this inflation ratio become retime-eligible when
    * [[CoInflateCount]] of them co-inflate in one capture — the r13
    * committed capture carried three such readings unflagged and
    * therefore un-retimed (its 2nd-most-expensive key at 1.82× of a
    * 1.65 s median, a 0.52 s-median key at 1.89×, a 0.44 s-median key at
    * 1.71× — all under tier 1's 2.0× bar), leaving real money
    * un-adjudicated.
    */
  private[graft] val ModerateRatio = 1.7

  /** The tier-1 per-query inflation predicate — unconditional flag. */
  private[graft] def tier1Inflated(secs: Double, median: Double): Boolean =
    secs > SuspectRatio * median && secs - median > SuspectMinDeltaSec

  /** The tier-2 (moderate) inflation predicate — flags only when
    * [[CoInflateCount]] such queries co-inflate in one capture (see
    * [[suspectVerdict]]). Shared with the retime adjudication
    * ([[retimeCleanVerdict]]) so "still inflated" and "flaggable" can
    * never drift apart.
    */
  private[graft] def tier2Inflated(secs: Double, median: Double): Boolean =
    median >= ModerateMedianSec && secs > ModerateRatio * median &&
      secs - median > SuspectMinDeltaSec

  /** Per-query medians over the last `window` CLEAN history entries —
    * entries that parse, carry a queries map, match this run's scale
    * factor (`sf`, when given: a dev run appended at sf0.01 must never
    * feed the medians that judge the driver's sf0.1 capture; an entry
    * MISSING the stamp counts as a mismatch unless the whole history
    * predates the field — see the grandfather clause below), and are
    * neither `degraded` (external-CPU contaminated) nor `suspect` (a
    * contaminated run must not feed the baseline that judges the next
    * one). Queries with fewer than `minSamples` clean readings are absent
    * — no verdict on thin history. Failed timings (−1) never enter a
    * median.
    *
    * A non-suspect entry whose retime pass read `retime_clean:false` is
    * DELIBERATELY still baseline-eligible: excluding it would have no
    * escape hatch — a genuine persistent regression of a few moderate
    * keys re-flags every run (tier 2) with retimes that honestly stay at
    * the new level, so `retime_clean` stays false forever, and an
    * excluded-forever entry class would freeze the stale medians and the
    * flag loop with them. Feeding the baseline instead re-converges the
    * medians after `minSamples` such runs and the flags clear — the same
    * self-healing direction as the all-suspect escape below, one tier
    * down. The cost (a contended-window entry nudges a few medians up
    * for one window) is bounded by the median, which one outlier cannot
    * move.
    *
    * NEW-NORMAL ESCAPE: when the `window` most recent eligible entries
    * are ALL suspect, they become the baseline instead. Without this, a
    * genuine persistent shift that slows several trivial queries together
    * (a config change, a JVM upgrade) would stamp every subsequent run
    * suspect forever — the stale pre-shift medians keep judging, nothing
    * new ever feeds them, and the flag degenerates to always-on, masking
    * both the shift and any real contention on top. A transient
    * contamination cannot trip the escape (its neighbors are clean); only
    * the persistent signature — `window` consecutive suspect runs —
    * re-converges the baseline to the measured new normal.
    */
  private[graft] def historyMedians(lines: Seq[String],
      window: Int = SuspectHistoryWindow,
      minSamples: Int = SuspectMinSamples,
      sf: Option[String] = None): Map[String, Double] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // most-recent-first parsed entries: (sf stamp, degraded, suspect, timings)
    val parsed = lines.reverseIterator.flatMap { l =>
      try {
        val n = mapper.readTree(l)
        def flagged(f: String) = Option(n.get(f)).exists(_.asBoolean)
        val qs = Option(n.get("queries")).filter(_.isObject).map { q =>
          val b = Map.newBuilder[String, Double]
          q.properties().forEach { e =>
            val v = e.getValue.asDouble(-1.0)
            if (v >= 0) b += e.getKey -> v
          }
          b.result()
        }
        Some((Option(n.get("sf")).map(_.asText()),
          flagged("degraded"), flagged("suspect"), qs))
      } catch { case _: Exception => None }
    }.toSeq
    // An entry with NO `sf` stamp is a mismatch the moment ANY entry in the
    // history carries one (ADVICE r11): "absent matches anything" let
    // pre-sf dev-scale lines keep feeding the medians that judge an sf0.1
    // capture long after stamped entries existed. The grandfather clause is
    // only for a wholly pre-sf history, where excluding unstamped entries
    // would mean no baseline at all — and the era test reads EVERY parsed
    // line, degraded/suspect included: a stamped-but-contaminated entry
    // still proves the stamp era began, it just cannot feed a median.
    val anyStamped = parsed.exists(_._1.isDefined)
    val entries = parsed.collect {
      case (sfStamp, false, suspectFlag, Some(qs))
          if sf.forall(want => sfStamp match {
            case Some(have) => have == want
            case None       => !anyStamped
          }) =>
        (suspectFlag, qs)
    }
    val recent = entries.take(window)
    val pool =
      if (recent.size >= window && recent.forall(_._1)) recent.map(_._2)
      else entries.filterNot(_._1).take(window).map(_._2)
    pool.flatMap(_.toSeq).groupMap(_._1)(_._2).collect {
      case (name, vs) if vs.size >= minSamples =>
        name -> vs.sorted.apply(vs.size / 2)
    }
  }

  /** Clean-history calibration baseline (VERDICT r14 next-step #1/#2): the
    * median of every per-chunk `load.chunk_load[*].<field>` over the
    * last [[SuspectHistoryWindow]] baseline-eligible entries (`field`
    * selects the probe — `calib_sec` for the single-thread loop,
    * `calib_par_sec` for the r17 parallel memory probe; entries predating
    * a probe carry no values for it and simply never feed its baseline,
    * so each new sensor self-arms after one clean probe-carrying run) —
    * same
    * eligibility as [[historyMedians]] (parses, sf-matched, neither
    * degraded nor suspect), so a contaminated run's inflated probes never
    * feed the yardstick that judges the next run. None below
    * [[SuspectMinSamples]] probe values (a first run has no baseline —
    * the calib verdicts then read null, never a guess).
    *
    * DELIBERATELY not filtered on the entries' own calib/env verdicts: a
    * genuinely slower new normal (hardware change, permanent quota) stamps
    * `env_inflated` runs only until a window of non-suspect entries at the
    * new speed re-converges this median — the same self-healing direction
    * as historyMedians' escape hatch (the median absorbs ≤2 contaminated
    * entries per window on its own).
    *
    * NEW-NORMAL ESCAPE (r15, the probe twin of historyMedians'): when the
    * `window` most recent probe-carrying, sf-matched entries are ALL
    * contaminated (degraded or suspect), THEIR probes become the baseline.
    * Without it, a box that becomes permanently ≳1.5× slower (hardware
    * class change) flags every chunk hot on the calib trigger, every run
    * stamps degraded, degraded entries never feed this baseline, and the
    * stale fast-era reference judges forever — the exact lock-in the
    * all-suspect escape was built against, one sensor over. A transient
    * contamination cannot trip it (its clean neighbors keep the clean
    * pool); only `window` consecutive contaminated probe-carrying entries
    * re-converge the reference to the measured new speed.
    */
  private[graft] def calibBaseline(lines: Seq[String],
      sf: Option[String] = None,
      window: Int = SuspectHistoryWindow,
      field: String = "calib_sec"): Option[Double] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // most-recent-first (contaminated?, probes) for probe-carrying entries
    val parsed = lines.reverseIterator.flatMap { l =>
      try {
        val n = mapper.readTree(l)
        def flagged(f: String) = Option(n.get(f)).exists(_.asBoolean)
        val sfOk = sf.forall(want =>
          Option(n.get("sf")).map(_.asText()).contains(want))
        if (!sfOk) None
        else
          Option(n.get("load")).flatMap(ld => Option(ld.get("chunk_load")))
            .filter(_.isArray).map { arr =>
              val b = Seq.newBuilder[Double]
              arr.forEach { c =>
                Option(c.get(field)).filter(_.isNumber)
                  .map(_.asDouble).filter(_ > 0).foreach(b += _)
              }
              b.result()
            }.filter(_.nonEmpty)
            .map(probes => (flagged("degraded") || flagged("suspect"), probes))
      } catch { case _: Exception => None }
    }.toSeq
    val recent = parsed.take(window)
    val pool =
      if (recent.size >= window && recent.forall(_._1)) recent.map(_._2)
      else parsed.filterNot(_._1).take(window).map(_._2)
    val vals = pool.flatten
    if (vals.size < SuspectMinSamples) None
    else Some(vals.sorted.apply(vals.size / 2))
  }

  /** The windowed clean-band totals (VERDICT r14 next-step #3): the last
    * `window` baseline-eligible entries' run totals, oldest first — the
    * "97–107 s" a round review re-derived from history by hand. Shared
    * between the bench's emitted `band` field and
    * [[graft.tools.HistoryReport]]'s header so the two can never disagree.
    * Eligibility mirrors the baseline rules (non-degraded, non-suspect,
    * sf-matched, numeric value) plus the r15 env verdicts: an entry that
    * stamped itself `env_inflated` or `calib_inflated` is contaminated by
    * its own admission and must not stretch the band it exists to anchor.
    *
    * `sf` matching is EXACT, including absence (ADVICE r15 #3): an entry
    * matches when its own stamp equals the Option — `None` matches only
    * entries that carry NO stamp. The prior `forall` made an sf-less
    * caller (a HistoryReport over a trail whose latest entry predates the
    * stamp) pool totals across ALL scales into one meaningless band.
    */
  private[graft] def cleanBandTotals(lines: Seq[String],
      sf: Option[String], window: Int = 10): Seq[Double] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.flatMap { l =>
      try {
        val n = mapper.readTree(l)
        def flagged(f: String) = Option(n.get(f)).exists(_.asBoolean)
        val sfOk = Option(n.get("sf")).map(_.asText()) == sf
        if (flagged("degraded") || flagged("suspect") ||
            flagged("env_inflated") || flagged("calib_inflated") || !sfOk) None
        else Option(n.get("value")).filter(_.isNumber).map(_.asDouble)
      } catch { case _: Exception => None }
    }.takeRight(window)
  }

  /** Windowed drift verdict over the clean totals (VERDICT r15 next-step
    * #4): median of the last [[TrendRecentN]] clean totals vs the median of
    * the up-to-[[TrendPriorN]] clean totals before them, with the creep
    * flag when the recent median sits past [[CreepRatio]]× the prior by at
    * least [[CreepMinDeltaSec]]. A slow creep hides inside a widening
    * min-max band (r14's clean captures were 101–105 s, r15's 119.4 s —
    * "inside" the adjudicated 98.9–120.9 band, so nothing flagged); the
    * trend asks the drift question directly. None below
    * [[TrendRecentN]]+[[TrendRecentN]] clean entries — a two-total trail
    * has no trend, only noise. Input is [[cleanBandTotals]]' output
    * (oldest first), so trend and band can never disagree on eligibility.
    */
  private[graft] val TrendRecentN = 3
  private[graft] val TrendPriorN = 5
  private[graft] val CreepRatio = 1.15
  private[graft] val CreepMinDeltaSec = 5.0
  private[graft] def cleanTrend(
      cleanTotals: Seq[Double]): Option[(Double, Double, Boolean)] =
    if (cleanTotals.size < 2 * TrendRecentN) None
    else {
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val recent = med(cleanTotals.takeRight(TrendRecentN))
      val prior  = med(cleanTotals.dropRight(TrendRecentN).takeRight(TrendPriorN))
      Some((recent, prior,
        recent > CreepRatio * prior && recent - prior > CreepMinDeltaSec))
    }

  /** The `band` field body: `[lo,hi]` over the clean totals, `null` when
    * the trail has none — one compact field that makes the closing line
    * self-contextualizing (VERDICT r14 next-step #3: a tail-only consumer
    * had to re-derive the clean band from the repo to read 276 s as an
    * outlier). 0.1-rounded: the band is a plausibility yardstick, not a
    * measurement.
    */
  private[graft] def bandJson(cleanTotals: Seq[Double]): String =
    if (cleanTotals.isEmpty) "null"
    else {
      def r1(x: Double) = math.round(x * 10) / 10.0
      s"[${r1(cleanTotals.min)},${r1(cleanTotals.max)}]"
    }

  // ---- plan-independent environment adjudication (VERDICT r14 #2) -------
  //
  // The r14 capture proved a whole-window contention mode no per-chunk
  // sensor saw: every query inflated ~2.6×, ext_cores/steal/io-PSI all
  // idle, and the artifact bottomed out at "suspect, retime not clean,
  // retime not hot" — byte-for-byte what a real multi-query regression
  // prints. Two FIXED workloads adjudicate that case without any
  // attribution model: the per-chunk calibration probe (calibProbe) and
  // the streaming smoke, whose 21-assertion suite is identical every run
  // (it read 105.16 s in r14 vs a 26–29 s history — a 3.8× scream nothing
  // consumed). Each is compared to its own clean-history median; the
  // combined `env_inflated` tri-state rides the closing line.

  /** Smoke-duration inflation bar (and its absolute floor): the smoke is
    * a fixed ~27 s workload whose clean spread is a couple of seconds, so
    * 1.5× + 3 s is far outside noise; r14's 105.16 s read 3.8×.
    */
  private[graft] val EnvSmokeRatio = 1.5
  private[graft] val EnvSmokeMinDeltaSec = 3.0
  /** Reporting smoke entries consulted for the baseline median. */
  private[graft] val SmokeBaselineWindow = 5

  /** The smoke duration (`value`) of one health line — None for skip
    * records and junk (a skipped smoke must never read as a 0-second
    * baseline sample).
    */
  private[graft] def smokeValueOf(line: String): Option[Double] =
    try {
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
      if (Option(n.get("failed")).exists(_.isNumber))
        Option(n.get("value")).filter(_.isNumber).map(_.asDouble)
      else None
    } catch { case _: Exception => None }

  /** Median smoke duration over the last [[SmokeBaselineWindow]] REPORTING
    * history entries (skip/timeout records don't count — same rule as
    * [[streamingRegression]]'s baseline). None below [[SuspectMinSamples]]
    * samples. Not filtered on contention flags — smoke lines carry none —
    * so the median's outlier absorption is the only defense; at window 5
    * it absorbs 2 contaminated captures, and a longer streak is the
    * new-normal case the baseline SHOULD converge to.
    */
  private[graft] def smokeBaseline(lines: Seq[String],
      window: Int = SmokeBaselineWindow): Option[Double] = {
    val vals = lines.reverseIterator.flatMap(smokeValueOf).take(window).toSeq
    if (vals.size < SuspectMinSamples) None
    else Some(vals.sorted.apply(vals.size / 2))
  }

  /** The calib side of the environment verdict: this run's MEDIAN chunk
    * probe against the clean-history baseline. Median, not max — one hot
    * chunk is the per-chunk flags' job; THIS verdict asks whether the
    * whole window ran slow. None without both sides.
    */
  private[graft] def calibVerdict(chunkCalibs: Seq[Double],
      ref: Option[Double]): Option[Boolean] = {
    val probes = chunkCalibs.filter(_ > 0)
    for (r <- ref; if probes.nonEmpty) yield {
      val med = probes.sorted.apply(probes.size / 2)
      med > CalibHotRatio * r && med - r > CalibMinDeltaSec
    }
  }

  /** The combined plan-independent verdict, tri-state like the retime
    * fields: true when EITHER fixed workload (chunk probes, smoke) read
    * inflated against its own clean history; false when at least one
    * could be judged and none was; null when neither had a baseline (a
    * first run must read unknown, never clean). An r14-style capture —
    * all queries inflated, every attribution sensor quiet — stamps true
    * here via the smoke alone, which is exactly the evidence the r14
    * artifact could not carry.
    */
  private[graft] def envInflatedVerdict(calib: Option[Boolean],
      smokeSec: Option[Double], smokeBase: Option[Double]): Option[Boolean] = {
    val smoke = for (cur <- smokeSec; base <- smokeBase)
      yield cur > EnvSmokeRatio * base && cur - base > EnvSmokeMinDeltaSec
    (calib, smoke) match {
      case (None, None) => None
      case _ => Some(calib.getOrElse(false) || smoke.getOrElse(false))
    }
  }

  /** The suspect verdict for one run: the (name-sorted) flagged queries,
    * each with its inflation RATIO over its history median (VERDICT r11
    * next-step #2 — a name list made r11's 5.2× `q_crossmodal_dups` and a
    * 2.1× wobble read the same; the ratio lets a consumer rank severity),
    * and the run-level flag — true when at least [[CoInflateCount]]
    * TRIVIAL-median queries inflated together (the contention signature; a
    * single slow query is as likely a real regression, which this flag
    * must never mask). A query flags unconditionally past
    * [[SuspectRatio]]× its median by at least [[SuspectMinDeltaSec]]
    * (tier 1); additionally (VERDICT r13 next-step #3) MODERATE
    * inflations — median ≥ [[ModerateMedianSec]], ratio past
    * [[ModerateRatio]] — flag when at least [[CoInflateCount]] of them
    * co-inflate in one capture: r13's committed capture carried 1.8× and
    * 2.2× readings on non-trivial keys that three co-inflating neighbors
    * adjudicated environmental, but only by hand — the second tier gets
    * them a retime. A LONE moderate inflation still never flags (it is as
    * likely a real regression as the lone tier-1 outlier, and unlike
    * tier 1 it is not even individually extreme). Ratios are rounded
    * to 0.1.
    */
  private[graft] def suspectVerdict(timed: Seq[(String, Double)],
      medians: Map[String, Double]): (Seq[(String, Double)], Boolean) = {
    def ratio(secs: Double, m: Double) = math.round(secs / m * 10) / 10.0
    val tier1 = timed.collect {
      case (name, secs) if secs >= 0 &&
        medians.get(name).exists(tier1Inflated(secs, _)) =>
        name -> ratio(secs, medians(name))
    }
    // tier-1 entries that ALSO satisfy the moderate predicate count toward
    // the co-inflation quorum (ratio ≥ 2 on a ≥0.4 s median is a fortiori
    // a moderate inflation) — the tier exists to widen the flag set, never
    // to raise the bar on what tier 1 already caught
    val moderate = timed.collect {
      case (name, secs) if secs >= 0 &&
        medians.get(name).exists(tier2Inflated(secs, _)) =>
        name -> ratio(secs, medians(name))
    }
    // the RUN-level stamp counts TIER-1 trivial flags only: tier 2 widens
    // which queries get retimed, never the documented run signature (≥3
    // trivial-median queries past 2.0×) — counting 1.7× tier-2 entries
    // with medians in [0.4, 0.5) would silently lower that bar, and a
    // suspect-stamped entry is excluded from the history baseline, so a
    // genuine shared-trunk regression at 1.8× would re-flag every run
    // until the all-suspect escape re-converged
    val runSuspect =
      tier1.count { case (n, _) => medians(n) < TrivialMedianSec } >= CoInflateCount
    // tier-2 eligibility is satisfied by its own quorum OR by a run-level
    // tier-1 suspect stamp (ADVICE r14 #3): once ≥3 trivial queries have
    // confirmed contention for the capture, a lone 1.7–2.0× moderate
    // reading in the same window is adjudicated by the same contention —
    // requiring a second, moderate-only quorum left exactly the r13-shaped
    // gap one notch narrower (1–2 moderates beside a confirmed-hot run
    // stayed unflagged and un-retimed). Retiming them is cheap under the
    // existing RetimeCap.
    val sus =
      (if (moderate.size >= CoInflateCount || (runSuspect && moderate.nonEmpty))
        (tier1 ++ moderate).distinctBy(_._1)
       else tier1).sortBy(_._1)
    (sus, runSuspect)
  }

  /** The `retimed` field body (VERDICT r12 next-step #2): the suspect
    * queries' one-pass re-readings as `{"q_x":secs,…}` — `{}` when the
    * run had nothing flagged, a raw `-1` when a retime repeat failed
    * (a failure must read as a failure, not vanish). Split out so the
    * spec can pin the shape without running a bench.
    */
  private[graft] def retimedFieldJson(vals: Seq[(String, Double)]): String =
    vals.map { case (n, v) => s"${jstr(n)}:$v" }.mkString("{", ",", "}")

  /** Retime-pass cost bound: at most this many flagged queries re-run.
    * A typical contended capture flags ~10 (r11/r12), well under the cap;
    * a fully-saturated box could flag most of the 144-key surface, and an
    * uncapped retime would then double the whole run — the cap keeps the
    * pass at one-to-two chunks. NOT a silent cap: the retimed map's
    * missing entries are visible against suspect_queries, and the
    * selection is worst-ratio-first so what gets dropped is the mildest
    * inflation — the part history medians adjudicate fine on their own.
    */
  private[graft] val RetimeCap = 24

  /** The flagged queries the retime pass re-runs: worst inflation ratio
    * first (the readings a consumer most needs a second opinion on),
    * capped at [[RetimeCap]], name-tiebroken for determinism.
    */
  private[graft] def retimeTargets(suspectQs: Seq[(String, Double)]): Seq[String] =
    suspectQs.sortBy { case (n, r) => (-r, n) }.take(RetimeCap).map(_._1)

  /** The retime ADJUDICATION, tri-state (VERDICT r13 next-step #1): the
    * r13 driver tail read `suspect:true` for a capture whose own retime
    * pass had proved all three flags ambient — the compact closing line
    * carries the scalar flags but (by design, to stay tail-sized) neither
    * `suspect_queries` nor `retimed`, so a tail-only consumer could not
    * see the run was clean. One additive boolean closes that:
    *
    *  - None (emitted `null`) — nothing was flagged; no adjudication ran.
    *  - Some(true) — EVERY flagged query was retimed and every retime
    *    landed back inside its median band (would re-flag under neither
    *    [[tier1Inflated]] nor [[tier2Inflated]] — the same predicates
    *    that flagged it, so "clean" is exactly "would not flag again").
    *  - Some(false) — some retime stayed inflated, errored (−1), or never
    *    ran (a [[RetimeCap]] drop: no evidence must never read as clean).
    */
  private[graft] def retimeCleanVerdict(suspectQs: Seq[(String, Double)],
      retimed: Seq[(String, Double)],
      medians: Map[String, Double]): Option[Boolean] =
    if (suspectQs.isEmpty) None
    else {
      val re = retimed.toMap
      Some(suspectQs.forall { case (name, _) =>
        re.get(name).exists(v => v >= 0 && medians.get(name).exists(m =>
          !tier1Inflated(v, m) && !tier2Inflated(v, m)))
      })
    }

  /** JSON rendering of the tri-state adjudication fields. */
  private[graft] def triState(v: Option[Boolean]): String =
    v.fold("null")(_.toString)

  /** Repo artifact the full per-query map persists to (overwritten per run)
    * + an append-only JSONL history — the record the driver's stdout tail
    * truncation cannot eat. Best-effort: an unwritable path must not fail
    * the bench. The directory comes from `SPARK_GRAFT_REPO_DIR`, else the
    * working directory when it looks like the repo root (has build.sbt),
    * else the canonical /root/repo (ADVICE r9: a hardcoded path silently
    * dropped the artifact on any other checkout).
    */
  private def repoDir: String =
    sys.env.get("SPARK_GRAFT_REPO_DIR")
      .orElse(
        if (new java.io.File("build.sbt").isFile)
          Some(new java.io.File(".").getCanonicalPath)
        else None)
      .getOrElse("/root/repo")
  private lazy val artifactPath = s"$repoDir/BENCH_FULL.json"
  // private[graft]: tools/HistoryReport reads the same trail the suspect
  // verdict feeds on, so the two can never disagree on WHICH file is history
  private[graft] lazy val historyPath = s"$repoDir/BENCH_HISTORY.jsonl"

  /** The snapshot+trail dual write both artifact families share: overwrite
    * `snapPath` with the line (the latest-run record), append it to
    * `histPath` (the cross-round trail). Best-effort — an unwritable path
    * must not fail the run that produced the line.
    */
  private def writeSnapshotAndHistory(snapPath: String, histPath: String,
      line: String): Unit =
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(snapPath),
        line + "\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(histPath),
        line + "\n", java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Exception =>
      System.err.println(s"[bench] $snapPath write failed: ${e.toString.take(200)}")
    }

  private def writeArtifact(line: String): Unit =
    writeSnapshotAndHistory(artifactPath, historyPath, line)

  /** Snapshot-only overwrite (ADVICE r15 #1): the pre-smoke provisional
    * artifact — if the JVM dies inside the smoke window, BENCH_FULL.json
    * still holds this run's complete timings (stamped `partial:true`, env
    * fields calib-side only). NO history append: the final line owns the
    * trail entry, so one run can never appear twice in the medians window.
    */
  private def writeSnapshotOnly(path: String, line: String): Unit =
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), line + "\n")
      ()
    } catch { case e: Exception =>
      System.err.println(s"[bench] $path write failed: ${e.toString.take(200)}")
    }

  /** Subset-run artifact (GRAFT_BENCH_QUERIES set): snapshot ONLY, to a
    * side path, and NO history append. A subset run's total is partial by
    * construction — letting it overwrite BENCH_FULL.json would ship a
    * misleading snapshot, and a clean-stamped partial entry appended to
    * BENCH_HISTORY.jsonl would both starve the 5-entry median window of
    * the non-subset queries' samples (silently disarming the next real
    * capture's suspect machinery) and shrink HistoryReport's clean band
    * toward the subset's tiny total.
    */
  private def writeSubsetArtifact(line: String): Unit =
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$repoDir/BENCH_SUBSET.json"), line + "\n")
      ()
    } catch { case e: Exception =>
      System.err.println(s"[bench] BENCH_SUBSET.json write failed: ${e.toString.take(200)}")
    }

  /** Persist one streaming-smoke health line: `STREAMING.json` is the
    * latest-run snapshot, `STREAMING_HISTORY.jsonl` the append-only trail
    * (VERDICT r10 next-step #4 — with only the overwritten file, a suite
    * that flipped red then green between round captures left no trace a
    * reviewer could see; bench timings already keep exactly this dual
    * record). `dir` is injectable so the spec exercises the real writer
    * against a tmp directory.
    *
    * A SUBSET bench run diverts to `STREAMING_SUBSET.json`, snapshot only
    * (ADVICE r14 #2, mirroring writeSubsetArtifact's rationale): a dev/e2e
    * subset run's smoke is as real as any, but letting it overwrite the
    * official snapshot and append to the trail would mutate the record the
    * round review and [[smokeBaseline]] feed on — the exact official-
    * artifact mutation the bench-side subset guard exists to prevent. The
    * subset bit reaches the forked smoke child via `GRAFT_STREAMING_SUBSET`
    * (the child writes its own record on success).
    */
  private[graft] def writeStreamingRecord(line: String,
      dir: String = repoDir, subset: Boolean = false): Unit =
    if (subset)
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/STREAMING_SUBSET.json"), line + "\n")
        ()
      } catch { case e: Exception =>
        System.err.println(s"[bench] STREAMING_SUBSET.json write failed: ${e.toString.take(200)}")
      }
    else
      writeSnapshotAndHistory(s"$dir/STREAMING.json",
        s"$dir/STREAMING_HISTORY.jsonl", line)

  /** Run the streaming-surface smoke ([[graft.tools.StreamingSmoke]]) in a
    * fresh JVM after the timing run (VERDICT r9 next-step #5: the T1–T8 /
    * incremental-dedup / sketch / packing / funnel / velocity surface was
    * green only under `sbt test`, which the driver never runs — now every
    * driver bench invocation records streaming health beside the query
    * timings, on stdout and as STREAMING.json). Forked, never in-process:
    * the smoke owns its SparkSession lifecycle and must not share the
    * bench's; where the fork is impossible (sbt-launcher classpath) the
    * smoke is skipped with an explicit line rather than half-run.
    * Hard-capped at min(10 minutes, `capSec` — the caller's remaining
    * deadline budget, ADVICE r16 #2: a HUNG smoke used to get its full
    * 600 s regardless, overshooting the internal deadline by up to ~9
    * minutes into the external-kill zone; now it is destroyed at the
    * budget boundary and its timeout skip record still lands) so a hung
    * stream cannot wedge the bench.
    *
    * Every failure branch (unforkable, child died before printing its
    * health line, launch exception) OVERWRITES `STREAMING.json` with its
    * skip/fail record: the child only writes the artifact on success, so
    * without the overwrite a wedged or crashed smoke would leave the
    * PREVIOUS run's green record sitting beside a fresh BENCH_FULL.json
    * with nothing to reveal it is stale. The TIMEOUT branch first scans
    * the child's output for an emitted health line (ADVICE r10): a child
    * that completed every suite — health line printed, artifact written —
    * but whose JVM lingered past the cap (e.g. a non-daemon streaming
    * thread after main returned) keeps its accurate record; only a child
    * that never reported gets the timeout record.
    */
  private def runStreamingSmoke(subset: Boolean,
      capSec: Double = 600.0): (Seq[String], Option[String]) = {
    val cap = math.max(1L, math.min(600.0, capSec).toLong)
    def record(line: String): (Seq[String], Option[String]) = {
      writeStreamingRecord(line, subset = subset)
      (Seq(line), None)
    }
    def healthLines(f: java.nio.file.Path): Seq[String] =
      java.nio.file.Files.readString(f).linesIterator
        .filter(_.startsWith("""{"metric":"streaming_smoke"""")).toSeq
    try {
      childJvm("graft.tools.StreamingSmoke", Nil) match {
        case None =>
          record("""{"metric":"streaming_smoke","skipped":true,"reason":"classpath not forkable"}""")
        case Some(pb) =>
          // a subset run's child must divert its own success record too
          // (ADVICE r14 #2 — the child writes the artifact, not the parent)
          if (subset) { pb.environment().put("GRAFT_STREAMING_SUBSET", "1"); () }
          // child stdout goes to a file, NOT a pipe: reading a pipe to EOF
          // would block this thread for as long as the child hangs, so the
          // 10-minute cap below could never fire. stderr to its own file
          // (r16): the smoke's Spark startup spew on the inherited console
          // could push the pre-smoke provisional closing line out of the
          // driver's merged tail if a kill lands inside the smoke window —
          // replayed below only when the smoke failed to report.
          val outFile = java.nio.file.Files.createTempFile("graft-smoke", ".out")
          val errFile = java.nio.file.Files.createTempFile("graft-smoke", ".err")
          try {
            pb.redirectOutput(outFile.toFile)
            pb.redirectError(errFile.toFile)
            val proc = pb.start()
            if (!proc.waitFor(cap, java.util.concurrent.TimeUnit.SECONDS)) {
              proc.destroyForcibly(); proc.waitFor()
              val health = healthLines(outFile)
              if (health.nonEmpty) {
                // the child reported and wrote its own artifact before
                // lingering — echo its line, keep its record
                System.err.println(s"[bench] streaming smoke JVM lingered past ${cap}s AFTER reporting; its record is kept")
                (health, health.lastOption)
              } else {
                replayChildStderr(errFile, "smoke")
                record(s"""{"metric":"streaming_smoke","skipped":true,"reason":"timeout after ${cap}s"}""")
              }
            } else {
              val health = healthLines(outFile)
              if (health.isEmpty) {
                replayChildStderr(errFile, "smoke")
                record(s"""{"metric":"streaming_smoke","skipped":true,"reason":"child rc=${proc.exitValue} with no health line"}""")
              } else (health, health.lastOption)
            }
          } finally {
            java.nio.file.Files.deleteIfExists(outFile)
            java.nio.file.Files.deleteIfExists(errFile); ()
          }
      }
    } catch { case e: Exception =>
      System.err.println(s"[bench] streaming smoke failed: ${e.toString.take(200)}")
      record(s"""{"metric":"streaming_smoke","skipped":true,"reason":${jstr("launch failed: " + e.toString.replaceAll("\\s+", " ").take(160))}}""")
    }
  }

  /** All lines of a file, empty on any trouble. */
  private def fileLines(path: String): Seq[String] =
    try {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isRegularFile(p))
        java.nio.file.Files.readString(p).linesIterator
          .filter(_.nonEmpty).toSeq
      else Seq.empty
    } catch { case _: Exception => Seq.empty }

  /** Streaming-health fields for the final headline (VERDICT r11 next-step
    * #6): this run's smoke `failed` count against the previous
    * `STREAMING_HISTORY.jsonl` entries', plus the one-field regression
    * verdict — a red→green (or green→red) flap between round captures is
    * now visible in the bench record itself, not only by diffing the
    * history file by hand. The baseline is the LAST entry that actually
    * REPORTED (carries a numeric `failed`): skip/timeout records — which
    * the failure branches append so staleness is visible — would otherwise
    * blind the comparison for a round after every wedged smoke. Returns
    * `"k":v,…` (no braces, no trailing comma) to splice AFTER the headline
    * body — appending keeps the historical `{"metric":"total_short",
    * "value":…` byte prefix intact for any consumer that matches on it; a
    * field is `null` when its side never reported (smoke skipped / no
    * health line / no reporting prior entry), and the regression verdict
    * is only non-null when BOTH sides did — a first run or a skipped
    * smoke must read unknown, not clean.
    */
  private[graft] def streamingRegression(current: Option[String],
      previous: Seq[String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def failedOf(line: Option[String]): Option[Int] = line.flatMap { l =>
      try Option(mapper.readTree(l).get("failed")).filter(_.isNumber).map(_.asInt)
      catch { case _: Exception => None }
    }
    val cur  = failedOf(current)
    val prev = previous.reverseIterator.flatMap(l => failedOf(Some(l)))
      .nextOption()
    val regressed = (cur, prev) match {
      case (Some(c), Some(p)) => (c > p).toString
      case _                  => "null"
    }
    s""""streaming_failed":${cur.fold("null")(_.toString)},""" +
      s""""streaming_prev_failed":${prev.fold("null")(_.toString)},""" +
      s""""streaming_regressed":$regressed"""
  }

  /** The bench's closing stdout sequence (VERDICT r11 next-step #1 +
    * r12 next-step #1): the smoke's record lines first, the repeated
    * `total_short` headline, then ONE compact `"metric":"total"` line as
    * the absolute last program output. The driver keeps only a 2000-char
    * tail of the output, and every `BENCH_r*.json` through r12 was
    * `parsed: null`: r8–r11 because startup spew pushed the metric lines
    * out of that window, r12 because — as r1's tail proves, where a
    * complete in-window `[info] {"metric":"total",…}` line still nulled —
    * the parser rejects sbt's log prefix (fixed in build.sbt via
    * `Compile / run / outputStrategy := StdoutOutput`) and most plausibly
    * keys on the `"metric":"total"` name its own full records carry
    * (the full `total` line with its ~6 KB queries map prints early and
    * always exceeds the window — hence the compact repeat, same headline
    * fields minus the big maps, short enough that line + sbt's
    * `[success]` trailer always fit the window together). Main prints
    * THROUGH this function so the ordering is pinned by BenchLoadSpec,
    * not by code layout.
    */
  private[graft] def closingLines(headline: String, closingTotal: String,
      smokeLines: Seq[String]): Seq[String] =
    smokeLines :+ headline :+ closingTotal

  /** Print the closing sequence — the ONLY stdout the bench produces after
    * the smoke returns, and the LAST it produces at all. `main` ends on
    * this call; no call site may print after it (the driver's tail parser
    * keys on the final compact `"metric":"total"` line — one stray
    * `println` behind it would resurrect the 13-round `parsed: null`
    * defect). The writer is injectable so BenchLoadSpec pins the emitted
    * order and the ends-on-closing-total contract without running a bench.
    */
  private[graft] def emitClosing(headline: String, closingTotal: String,
      smokeLines: Seq[String], out: String => Unit): Unit =
    closingLines(headline, closingTotal, smokeLines).foreach(out)

  /** The compact closing `"metric":"total"` line (VERDICT r12 next-step
    * #1): the headline's scalar fields, none of the per-query /
    * per-chunk maps, so the whole line stays a few hundred bytes — small
    * enough that it plus sbt's trailer always fit the driver's 2000-char
    * stdout tail (BenchLoadSpec pins a worst-case-width byte budget).
    * `"metric":"total"` therefore appears TWICE per run
    * (the early full line with the queries map feeds BENCH_FULL.json /
    * history; this compact one feeds the tail parser): the consumer
    * contract for both `total` and the repeated `total_short` is
    * at-least-once / LAST-wins — a JSONL consumer must key on the final
    * occurrence, never count or sum per metric name (ADVICE r12).
    *
    * `retime_clean` (VERDICT r13 next-step #1) is the one adjudication
    * field a tail-only consumer needs beside `suspect`: `suspect:true`
    * with `retime_clean:true` reads "flagged, but the run's own retime
    * pass proved every flag ambient" — r13's exact case, which the tail
    * alone could not see. `retime_hot` (ADVICE r13 #2) qualifies the
    * adjudication itself: true when any retime chunk ran under the same
    * contention signals that degrade a run, so a still-inflated retime
    * can be read as "the second opinion was also hot", not as a
    * confirmed regression. Both tri-state: `null` when nothing was
    * flagged (no adjudication ran).
    *
    * r15 additions (VERDICT r14 next-steps #2/#3): `env_inflated` — the
    * plan-independent fixed-workload verdict ([[envInflatedVerdict]]);
    * true means "this window ran slow against clean history for reasons
    * no query plan can explain", which is the reading the r14 artifact
    * could not give — and `band`, the clean-history total band `[lo,hi]`
    * (null on a bandless trail), so a tail-only consumer can read this
    * line's `value` AS an outlier (or not) without the repo. The decision
    * table for the flag pair lives in README's bench-contract section.
    *
    * r16 additions (VERDICT r15 next-steps #1–#3): `partial:true` stamps
    * the PROVISIONAL cumulative record printed after every chunk (and
    * once more pre-smoke) so a kill at any instant leaves a parseable
    * best-available record in the stdout tail — the final line DROPS the
    * stamp (absent, not false), and last-wins still holds; `wall_sec` is
    * the run's own wall clock so the capture's protocol cost is a
    * published number, not a verdict estimate; `queries_skipped` counts
    * keys the internal deadline skipped (0 on a completed run) — a
    * nonzero count beside `deadline_hit:true` in the full line is the
    * skip-record signature, never a silent truncation.
    */
  private[graft] def closingTotalLine(total: Double, degraded: Boolean,
      suspect: Boolean, retimeClean: Option[Boolean],
      retimeHot: Option[Boolean], envInflated: Option[Boolean],
      band: String, run: Int, failed: Int, sfDir: String,
      streamingFields: String, wallSec: Double = 0.0, skipped: Int = 0,
      repeats: Int = 3, partial: Boolean = false): String =
    s"""{"metric":"total","value":$total,"unit":"sec","repeats":$repeats,""" +
      (if (partial) """"partial":true,""" else "") +
      s""""wall_sec":${math.round(wallSec * 10) / 10.0},""" +
      s""""degraded":$degraded,"suspect":$suspect,""" +
      s""""retime_clean":${triState(retimeClean)},""" +
      s""""retime_hot":${triState(retimeHot)},""" +
      s""""env_inflated":${triState(envInflated)},""" +
      s""""band":$band,""" +
      s""""queries_run":$run,"queries_failed":$failed,""" +
      s""""queries_skipped":$skipped,""" +
      s"""$streamingFields,"sf":${jstr(sfDir)}}"""

  /** Print one line as a single write+flush. Under the prefix-free
    * `StdoutOutput` strategy the forked bench shares the console pipe
    * with its children's inherited stderr; `println`'s two writes (text,
    * then newline) could let a late stderr burst land mid-line in a
    * merged capture, and a torn closing line is exactly the parse this
    * exists to guarantee. One ≤4 KB write on a pipe is atomic on Linux.
    */
  private def printAtomic(line: String): Unit = {
    System.out.write((line + "\n").getBytes("UTF-8"))
    System.out.flush()
  }

  /** The run's query list from the optional `GRAFT_BENCH_QUERIES` comma
    * list (dev/e2e plumbing, never set by the driver): the retime e2e gate
    * (BenchE2eSpec) exercises the whole suspect→retime→closing-line path
    * against a handful of queries instead of the full surface. Unknown
    * names drop with a stderr warning; a NON-EMPTY list that resolves to
    * ZERO known names is a HARD ERROR (ADVICE r14 #1): the old silent
    * fallback-to-everything meant a typo'd prefix on every entry turned an
    * intended subset run into a full run — which then wrote the official
    * BENCH_FULL.json and appended a real history entry, the exact
    * official-artifact mutation the subset guard exists to prevent. An
    * unset or blank variable still means the full surface. Deduplicated —
    * a repeated name would be timed and counted twice (triple-counting
    * `total`, duplicate JSON keys, and one query's inflation contributing
    * multiple entries to the co-inflation quorum), and a duplicate could
    * make a PARTIAL list read as size == the full surface, defeating the
    * subset-artifact guard. Always sorted — the deterministic order is
    * what keeps warm-up attribution comparable across runs.
    */
  private[graft] def benchQueryNames(env: Option[String]): Seq[String] =
    env.filter(_.trim.nonEmpty) match {
      case Some(s) =>
        val asked = s.split(',').toSeq.map(_.trim).filter(_.nonEmpty).distinct
        val (known, unknown) = asked.partition(SparkEntry.queries.contains)
        if (unknown.nonEmpty)
          System.err.println(
            s"[bench] GRAFT_BENCH_QUERIES: dropping unknown names: ${unknown.mkString(",")}")
        if (known.isEmpty)
          throw new IllegalArgumentException(
            s"GRAFT_BENCH_QUERIES is set but resolves to zero known queries: '$s'")
        known.sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    if (args.length >= 2 && args(0) == "--chunk") {
      val repeats  = if (args.length >= 3) args(2).toIntOption.getOrElse(3) else 3
      val phasesOn = if (args.length >= 4) args(3) != "0" else true
      val quickCsv = if (args.length >= 5) args(4) else ""
      childMain(args(1), sfDir, cpus, repeats, phasesOn, quickCsv); return
    }

    // the run's own wall clock, started before any work: feeds the
    // internal deadline (VERDICT r15 next-step #1) and the published
    // wall_sec (next-step #3 — the protocol's cost is now a number)
    val startNanos = System.nanoTime()
    def elapsedSec = (System.nanoTime() - startNanos) / 1e9
    val deadlineSec = benchDeadlineSec(sys.env.get("GRAFT_BENCH_DEADLINE_SEC"))
    def remainingSec = deadlineSec - elapsedSec

    val jiffies0 = cpuJiffies()
    val cores = Runtime.getRuntime.availableProcessors
    val names = benchQueryNames(sys.env.get("GRAFT_BENCH_QUERIES"))
    // a subset run is any run not covering the full graded surface — its
    // artifacts go to the side path (see writeSubsetArtifact)
    val subsetRun = names.size < SparkEntry.queries.size
    // history is read ONCE, before anything appends (the discipline every
    // history consumer here shares): it feeds the per-query medians, the
    // calibration-probe baseline the chunk loop's hot checks use, the
    // quick-key set, and the clean band the closing lines publish
    val histLines = fileLines(historyPath)
    val calibRef = calibBaseline(histLines, sf = Some(sfDir))
    // the parallel-probe baseline (VERDICT r16 next-step #3) — None until
    // one clean probe-carrying run has landed, so the new sensor self-arms
    val calibParRef =
      calibBaseline(histLines, sf = Some(sfDir), field = "calib_par_sec")
    // history plausibility (VERDICT r10 next-step #1): each query judged
    // against its own median over the last clean history entries — also
    // the source of the quick-key (repeats=1) set, and of the cumulative
    // suspect verdicts on the provisional closing lines
    val medians = historyMedians(histLines, sf = Some(sfDir))
    val quick = quickKeys(names, medians)
    // the clean-history band, so a tail-only consumer can read any closing
    // line's `value` as inside/outside the tree's normal range (r14 #3)
    val band = bandJson(cleanBandTotals(histLines, sf = Some(sfDir)))
    // the PREVIOUS smoke records, read before this run's smoke appends its
    // own — also pre-read so provisional closing lines can carry the
    // null-sided streaming fields without touching a mid-append file
    val prevSmoke = fileLines(s"$repoDir/STREAMING_HISTORY.jsonl")
    // JIT-warm both probes so chunk 0's readings measure the box, not the
    // C2 compile of the loops (the parallel probe's first call also pays
    // its 64 MB allocation + first-touch here, outside any window)
    calibProbe(); calibProbe()
    calibProbePar(); calibProbePar()
    val chunkSize = chunkSizeFromEnv(sys.env.get("GRAFT_BENCH_CHUNK_SIZE"))
    // rotate the chunk ORDER by the history length (VERDICT r16 next-step
    // #1): a deadline trip skips whatever is still un-run, and sorted
    // order starved the same alphabetical tail on every contended run —
    // the offset moves that burden across the surface run-over-run while
    // each individual run stays deterministic
    val chunks = rotatedChunks(names.grouped(chunkSize).toSeq, histLines.size)
    var forked = 0
    var retried = 0
    // a persistently-loaded box must not double the run: at most 3 chunk
    // retries per run — past that the run is degraded and says so
    var retryBudget = 3
    // deadline state (VERDICT r15 next-step #1): `ladder` degrades the
    // remaining chunks when the measured pace projects past the budget;
    // `deadlineHit` skips them outright once the budget is spent
    var ladder = false
    var deadlineHit = false
    val timedBuf   = scala.collection.mutable.ArrayBuffer.empty[Timed]
    val loadBuf    = scala.collection.mutable.ArrayBuffer.empty[ChunkLoad]
    val skippedBuf = scala.collection.mutable.ArrayBuffer.empty[String]
    // streaming-smoke state (VERDICT r16 next-step #2): the smoke may now
    // run MID-LOOP — the moment the remaining budget first drops inside
    // the reserve window — so a deadline-bound run keeps its streaming
    // evidence instead of sacrificing it to time one more chunk. Value
    // check, not presence: =0 / empty must mean "run it".
    val smokeSkippedByEnv =
      sys.env.get("GRAFT_SKIP_STREAMING_SMOKE").exists(v => v.nonEmpty && v != "0")
    var smokeDone = false
    var smokeResult: (Seq[String], Option[String]) = (Seq.empty, None)
    var smokeWallSec = 0.0
    def runSmokeNow(): Unit = if (!smokeDone) {
      smokeDone = true
      val t0s = elapsedSec
      // the wait is capped at the remaining budget (ADVICE r16 #2): a hung
      // smoke is destroyed at the boundary, its timeout record still lands
      smokeResult = runStreamingSmoke(subsetRun, capSec = remainingSec)
      smokeWallSec = elapsedSec - t0s
    }
    // cumulative provisional closing line (VERDICT r15 next-step #2):
    // printed after every chunk so whatever instant the process dies, the
    // stdout tail holds a parseable record of everything timed so far —
    // superseded by the next one, last-wins like every metric line here
    def printProvisional(): Unit = {
      val sofar = timedBuf.toSeq
      val totalSoFar = sofar.collect { case Timed(_, v, None, _, _) => v }.sum
      val hotSoFar = loadBuf.zipWithIndex.exists { case (c, i) =>
        isHot(c, cores, firstChunk = i == 0, calibRef = calibRef,
          calibParRef = calibParRef) }
      val (_, susSoFar) =
        suspectVerdict(sofar.map(t => t.name -> t.secs), medians)
      printAtomic(closingTotalLine(totalSoFar,
        degraded = hotSoFar || ladder || deadlineHit, suspect = susSoFar,
        retimeClean = None, retimeHot = None, envInflated = None,
        band = band, run = sofar.size, failed = sofar.count(_.err.isDefined),
        sfDir = sfDir, streamingFields = streamingRegression(None, prevSmoke),
        wallSec = elapsedSec, skipped = skippedBuf.size,
        repeats = if (ladder) 1 else 3, partial = true))
    }
    chunks.zipWithIndex.foreach { case (chunk, ci) =>
      // the smoke reserve check comes BEFORE the chunk budget check: when
      // the remaining budget first dips under the reserve — or the
      // measured pace projects the next chunk jumping clean over the
      // window (see smokeDueNow) — the smoke runs now; the chunks that
      // follow get whatever is left. The pace numerator excludes the
      // smoke's own wall: chunk pace must measure chunks.
      val chunkPaceSec =
        if (ci > 0) (elapsedSec - smokeWallSec) / ci else 0.0
      if (!smokeSkippedByEnv && !smokeDone && !deadlineHit &&
          smokeDueNow(remainingSec, projectedChunkSec = chunkPaceSec)) {
        System.err.println(f"[bench] remaining budget $remainingSec%.0f s is " +
          f"inside the $SmokeReserveSec%.0f s smoke reserve — running the " +
          "streaming smoke before the last chunks spend it")
        runSmokeNow()
      }
      if (deadlineHit || remainingSec <= 0) {
        // budget spent: every un-run key becomes a visible skip record —
        // the closing sequence prints right after the loop, which is the
        // whole point (r15's rc 124 left NO record at all)
        deadlineHit = true
        skippedBuf ++= chunk
      } else {
        // pace numerator excludes the mid-loop smoke's wall (it is a
        // one-off, not a per-chunk cost): a run whose chunk pace was in
        // hand must not degrade because the reserve fired between chunks
        if (!ladder && ladderNeeded(ci, chunks.length,
            elapsedSec - smokeWallSec, remainingSec)) {
          ladder = true
          System.err.println(f"[bench] pace projects past the $deadlineSec%.0f s " +
            "deadline — degrading remaining chunks to repeats=1, no phase evaluations")
        }
        val reps = if (ladder) 1 else 3
        var (t, fk, cl) = timeChunk(chunk, sfDir, cpus, reps, quick, !ladder)
        // retry on CPU-shaped signals only (includeNonRetryable = false —
        // see isHot): the io/throttle triggers still reach the published
        // verdict via loadFieldsJson. Never with the deadline spent: a
        // retry that overshoots the budget trades one contaminated chunk
        // for the whole run's epilogue.
        if (isHot(cl, cores, firstChunk = ci == 0, includeNonRetryable = false,
            calibRef = calibRef, calibParRef = calibParRef) &&
            retryBudget > 0 && remainingSec > 0) {
          retryBudget -= 1; retried += 1
          System.err.println(s"[bench] chunk '${chunk.head}…' ran hot " +
            s"(load=${cl.startLoad} ext_cores=${cl.externalCores} " +
            s"steal=${cl.stealPct}% io_some=${cl.ioSomePct}% " +
            s"io_full=${cl.ioFullPct}% cpu_some=${cl.cpuSomePct}% " +
            s"calib=${cl.calibSec}s calib_par=${cl.calibParSec}s) — retrying once")
          val again = timeChunk(chunk, sfDir, cpus, reps, quick, !ladder)
          t = again._1; fk = again._2; cl = again._3
        }
        if (fk) forked += 1
        timedBuf ++= t; loadBuf += cl
        printProvisional()
      }
    }
    val timed: Seq[Timed] = timedBuf.toSeq
    val chunkLoads: Seq[ChunkLoad] = loadBuf.toSeq
    // wall attribution (r16, beside wall_sec): where the protocol's cost
    // went — the chunk loop (timings + fork startups) vs the retime pass
    // vs the smoke (r17: it may run mid-loop, so its wall is its own
    // field, subtracted from the chunk share); the remainder is
    // launcher/artifact overhead. Published so a wall regression can be
    // attributed from the artifact instead of re-profiled.
    val wallAfterChunks = elapsedSec
    val chunksWallSec = wallAfterChunks - smokeWallSec
    // the reserve can also fire at the PRE-RETIME check below, i.e. after
    // this boundary: snapshot what the smoke had cost by now so the retime
    // share can subtract only ITS smoke wall (not the mid-loop share,
    // already excluded from chunksWallSec) — the three published shares
    // must partition wall_sec, never over-count it
    val smokeWallAtChunksEnd = smokeWallSec

    val qs = timed.map(t => s"${jstr(t.name)}:${t.secs}").mkString("{", ",", "}")
    val errs = timed.collect { case Timed(k, _, Some(m), _, _) => s"${jstr(k)}:${jstr(m)}" }
      .mkString("{", ",", "}")
    // per-query steal context (r15): SPARSE — only queries whose own repeat
    // window saw any steal carry a key (an absent key reads "quiet window",
    // a 0.0 from a /proc-less host never emits). Diagnostic beside the
    // suspect flags: a flagged query with 20% steal in ITS window is burst
    // contention the chunk averages structurally cannot show.
    val qStealJson = timed.filter(_.stealPct > 0.0)
      .map(t => s"${jstr(t.name)}:${t.stealPct}").mkString("{", ",", "}")
    // composite-query phase splits (VERDICT r10 next-step #5): a separate
    // top-level block keyed by query name, so the scalar `queries` map —
    // what every existing consumer parses — is untouched and totals are
    // unchanged; `queries[k] − Σ phases[k]` is the lazy serve residual
    def r3(x: Double) = math.round(x * 1000) / 1000.0
    val phasesJson = timed.filter(_.phases.nonEmpty).map { t =>
      s"${jstr(t.name)}:" + t.phases.map { case (p, v) => s"${jstr(p)}:${r3(v)}" }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val total = timed.collect { case Timed(_, v, None, _, _) => v }.sum
    // machine-load context: run-level steal% + end loadavg, per-chunk
    // load/steal/external-cores, and the run's degraded verdict (any chunk
    // still hot after its retry) — VERDICT r9 next-step #1
    val runSteal = for ((s0, _, t0) <- jiffies0; (s1, _, t1) <- cpuJiffies()
        if t1 > t0) yield math.round((s1 - s0) * 10000.0 / (t1 - t0)) / 100.0
    val (loadJson, loadDegraded) =
      loadFieldsJson(chunkLoads, cores, runSteal, loadAvg1(), calibRef,
        calibParRef)
    // a deadline-tripped or ladder-degraded run is degraded by definition
    // (VERDICT r15 next-step #1: partial/reduced-protocol totals must
    // never feed the clean band or the history medians). A def, not a val:
    // the retime loop below can still trip deadlineHit.
    def degraded = loadDegraded || deadlineHit || ladder
    val (suspectQs, suspect) = suspectVerdict(timed.map(t => t.name -> t.secs),
      medians)
    val suspectJson = suspectQs.map { case (n, _) => jstr(n) }.mkString("[", ",", "]")
    // the SAME flagged set as an object keyed by ratio (VERDICT r11 #2):
    // the name list stays for existing consumers, the ratios rank severity
    val ratiosJson = suspectQs.map { case (n, r) => s"${jstr(n)}:$r" }
      .mkString("{", ",", "}")
    // self-healing suspect captures (VERDICT r12 next-step #2): two rounds
    // running, the official capture landed under host load the chunk-level
    // isHot never saw (per-query inflation, not a load/steal/PSI breach) —
    // so the pass fires whenever ANYTHING was flagged (run-level suspect
    // or not — ADVICE r13 #1: a lone tier-1 outlier is exactly the reading
    // that most needs a second opinion, since it is as likely a real
    // regression as contention): the flagged queries get ONE more
    // sequential pass through the existing chunk fork machinery (fresh
    // JVM, warm-up, median-of-3) and the re-readings ride beside
    // suspect_ratios as `retimed`. Strictly ADDITIVE: `value` and
    // `queries[k]` stay the original capture's (the retime is adjudication
    // evidence, not a do-over — a retime that also ran hot must not
    // silently overwrite a number the flags already mark); a flagged query
    // whose retime lands inside its median band is thereby adjudicated
    // environmental in the artifact itself, no reach into history needed.
    // The retime chunks' OWN load is measured like any other chunk's
    // (ADVICE r13 #2): `retime_hot` below says whether the second opinion
    // itself ran under contention — a still-inflated retime under a hot
    // window must not read as a confirmed regression.
    // Deadline-aware (r16): the pass never starts on a spent budget, and
    // checks again before each retime chunk — un-run retimes read as
    // retime_clean:false via the no-evidence rule, never as clean. Phase
    // evaluations stay off here: the retime is a timing second opinion,
    // and its flagged composites already shipped their splits in the
    // main pass.
    // the smoke reserve applies here too: a retime pass on a contended run
    // is exactly when the budget is tight — the round's streaming evidence
    // outranks a second opinion on a few flagged timings
    if (!smokeSkippedByEnv && !smokeDone && suspectQs.nonEmpty &&
        !deadlineHit && smokeDueNow(remainingSec))
      runSmokeNow()
    val retimeRuns: Seq[(Seq[Timed], Boolean, ChunkLoad)] =
      if (suspectQs.isEmpty || deadlineHit || remainingSec <= 0) Nil
      else retimeTargets(suspectQs).grouped(chunkSize).toSeq.flatMap { c =>
        if (remainingSec <= 0) { deadlineHit = true; None }
        else Some(timeChunk(c, sfDir, cpus,
          repeats = if (ladder) 1 else 3, quick = quick,
          phasesEnabled = false))
      }
    val retimeWallSec =
      elapsedSec - wallAfterChunks - (smokeWallSec - smokeWallAtChunksEnd)
    val retimed = retimeRuns.flatMap(_._1.map(t => t.name -> t.secs))
    val retimedJson = retimedFieldJson(retimed)
    // no firstChunk trigger: the retime runs after minutes of the bench's
    // own work, so loadavg is self-polluted there (same rule as chunk 2+);
    // the retime chunks' own calib probes are judged against the same
    // clean-history reference as the timed chunks'
    val retimeHot: Option[Boolean] =
      if (retimeRuns.isEmpty) None
      else Some(retimeRuns.exists(r => isHot(r._3, cores, calibRef = calibRef,
        calibParRef = calibParRef)))
    val retimeClean = retimeCleanVerdict(suspectQs, retimed, medians)
    // the calib side of the env verdict is smoke-independent — computed
    // BEFORE the final smoke position so the pre-smoke provisional records
    // can carry it. Tri-state OR of BOTH probes (r17): either fixed
    // workload reading inflated against its own clean history stamps the
    // run; null only when neither has a baseline yet.
    val calibInfSt  = calibVerdict(chunkLoads.map(_.calibSec), calibRef)
    val calibInfPar = calibVerdict(chunkLoads.map(_.calibParSec), calibParRef)
    val calibInf: Option[Boolean] = (calibInfSt, calibInfPar) match {
      case (None, None) => None
      case (a, b)       => Some(a.getOrElse(false) || b.getOrElse(false))
    }
    val smokeBase = smokeBaseline(prevSmoke)
    // deadline/ladder instrumentation + the skip records (r16): `skipped`
    // names every key the internal deadline left un-run — a reader sees
    // exactly what is missing from `queries`, never a silent truncation
    val skippedJson = skippedBuf.map(jstr).mkString("[", ",", "]")
    // the quick-key set rides the FULL line (ADVICE r16 #3): `repeats` is
    // nominal-only — quick keys use the adaptive estimator regardless — so
    // a consumer of `queries[k]` can tell which estimator produced which
    // value without reverse-engineering the medians
    val quickKeysJson =
      names.filter(quick.contains).map(jstr).mkString("[", ",", "]")
    def r1(x: Double) = math.round(x * 10) / 10.0
    def budgetFields =
      s""""wall_sec":${r1(elapsedSec)},""" +
        s""""wall_chunks_sec":${r1(chunksWallSec)},""" +
        s""""wall_retime_sec":${r1(retimeWallSec)},""" +
        s""""wall_smoke_sec":${r1(smokeWallSec)},""" +
        s""""deadline_sec":$deadlineSec,"deadline_hit":$deadlineHit,""" +
        s""""ladder":$ladder,"quick_n":${timed.count(t => quick.contains(t.name))},""" +
        s""""skipped":$skippedJson"""
    val isolation =
      s""""chunks":${chunks.length},"chunks_forked":$forked,"chunk_size":$chunkSize,"chunks_retried":$retried"""
    // ONE full-line builder so the pre-smoke provisional artifact and the
    // final line cannot drift in shape — they differ only in the env
    // fields (calib-only vs smoke-adjudicated) and the partial stamp
    def fullLineJson(envInfJ: Option[Boolean], partial: Boolean): String = {
      val adjudication =
        s""""retime_clean":${triState(retimeClean)},"retime_hot":${triState(retimeHot)},""" +
          s""""env_inflated":${triState(envInfJ)},"calib_inflated":${triState(calibInf)},""" +
          s""""band":$band"""
      s"""{"metric":"total","value":$total,"unit":"sec","repeats":${if (ladder) 1 else 3},""" +
        (if (partial) """"partial":true,""" else "") +
        s"""$budgetFields,"degraded":$degraded,"suspect":$suspect,"suspect_queries":$suspectJson,"suspect_ratios":$ratiosJson,"retimed":$retimedJson,$adjudication,$isolation,"quick_keys":$quickKeysJson,"queries":$qs,"phases":$phasesJson,"query_steal":$qStealJson,"errors":$errs,"load":$loadJson,"sf":"$sfDir"}"""
    }
    // pre-smoke persistence + provisional closing line (ADVICE r15 #1 +
    // VERDICT r15 next-step #2): r15 moved the smoke BEFORE the artifact
    // write, so a kill inside the smoke window lost the entire timing
    // run. The snapshot (never the history — see writeSnapshotOnly) and
    // one more partial-stamped closing line land first; the final records
    // supersede both the moment the smoke returns.
    if (!subsetRun)
      writeSnapshotOnly(artifactPath, fullLineJson(
        envInflatedVerdict(calibInf, None, smokeBase), partial = true))
    printAtomic(closingTotalLine(total, degraded, suspect, retimeClean,
      retimeHot, envInflatedVerdict(calibInf, None, smokeBase), band,
      timed.size, timed.count(_.err.isDefined), sfDir,
      streamingRegression(None, prevSmoke), wallSec = elapsedSec,
      skipped = skippedBuf.size, repeats = if (ladder) 1 else 3,
      partial = true))
    // the streaming smoke completes BEFORE the final artifact lines are
    // built (r15): its duration doubles as the second fixed-workload
    // sensor of the env verdict, so the full line and the closing line can
    // carry ONE consistent `env_inflated` instead of a calib-only preview.
    // The smoke's own stdout lines still print last, via emitClosing.
    // If the reserve trigger already ran it mid-loop (r17), this is a
    // no-op; otherwise it runs here with the remaining budget as its wait
    // cap. Only a budget under [[SmokeMinRemainSec]] — where the ~45 s
    // suite cannot finish anyway — skips it with the explicit deadline
    // record. NOT a deadline_hit/degraded stamp of its own: a complete
    // query surface with a budget-skipped smoke is still a clean total —
    // the skip record (and null env fields) carry the story.
    if (!smokeSkippedByEnv && !smokeDone) {
      if (remainingSec < SmokeMinRemainSec) {
        val line = """{"metric":"streaming_smoke","skipped":true,"reason":"bench deadline"}"""
        writeStreamingRecord(line, subset = subsetRun)
        smokeDone = true
        smokeResult = (Seq(line), None)
      } else runSmokeNow()
    }
    val (smokeLines, health) = smokeResult
    // plan-independent environment adjudication (VERDICT r14 next-step
    // #2): both fixed workloads against their own clean history — the
    // chunk probes (calib_inflated) and the smoke duration — combined as
    // env_inflated. This is what the r14 capture was missing: 276 s with
    // every sensor quiet now stamps env_inflated:true off the 3.8×
    // smoke + inflated probes, readable from the tail alone.
    val envInf = envInflatedVerdict(calibInf,
      health.flatMap(smokeValueOf), smokeBase)
    val fullLine = fullLineJson(envInf, partial = false)
    println(fullLine)
    // The full line above grows with the query count and the driver keeps
    // only the tail of the output, so the full map ALSO goes to the repo
    // artifact + history (VERDICT r8 missing #2), and the headline fields
    // repeat on SHORT lines the stdout tail always keeps: the top-10
    // slowest timings, then the total — printed once here for a live
    // reader, and once more as the FINAL stdout line (since r16 every
    // child's stderr is diverted to a temp file, so no Spark startup spew
    // can land in the driver's merged tail at all) so the
    // driver's tail parser is guaranteed to see it (VERDICT r11 #1), and
    // once more — compact, no maps — as the final `"metric":"total"` line
    // (VERDICT r12 #1). Both `total` and `total_short` are therefore
    // at-least-once / LAST-wins on stdout (ADVICE r12): the repeats carry
    // identical headline values, so a last-match consumer — which the
    // fixed-size-tail driver is — reads one consistent record; a
    // per-metric counter/summer must not run on this stream (documented
    // in README's bench-contract section).
    if (subsetRun) writeSubsetArtifact(fullLine) else writeArtifact(fullLine)
    val slowest = timed.filter(_.err.isEmpty).sortBy(-_.secs).take(10)
      .map(t => s"${jstr(t.name)}:${t.secs}").mkString("{", ",", "}")
    println(s"""{"metric":"slowest10","unit":"sec","queries":$slowest,"sf":"$sfDir"}""")
    val failed = timed.count(_.err.isDefined)
    val adjudication =
      s""""retime_clean":${triState(retimeClean)},"retime_hot":${triState(retimeHot)},""" +
        s""""env_inflated":${triState(envInf)},"calib_inflated":${triState(calibInf)},""" +
        s""""band":$band"""
    val shortBody =
      s""""value":$total,"unit":"sec","repeats":${if (ladder) 1 else 3},$budgetFields,"degraded":$degraded,"suspect":$suspect,"suspect_queries":$suspectJson,"suspect_ratios":$ratiosJson,"retimed":$retimedJson,$adjudication,$isolation,"queries_run":${timed.size},"queries_failed":$failed,"queries_skipped":${skippedBuf.size},"load":$loadJson,"sf":"$sfDir""""
    println(s"""{"metric":"total_short",$shortBody}""")
    // streaming fields APPENDED so the final line's byte prefix is exactly
    // the historical total_short shape a prefix-matching parser expects
    val streamingFields = streamingRegression(health, prevSmoke)
    val finalHeadline =
      s"""{"metric":"total_short",$shortBody,$streamingFields}"""
    // the ABSOLUTE last statement of main — nothing may print after it
    // (see emitClosing; BenchLoadSpec pins the order and byte budget)
    emitClosing(finalHeadline,
      closingTotalLine(total, degraded, suspect, retimeClean, retimeHot,
        envInf, band, timed.size, failed, sfDir, streamingFields,
        wallSec = elapsedSec, skipped = skippedBuf.size,
        repeats = if (ladder) 1 else 3),
      smokeLines, printAtomic)
  }
}
