package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench's self-qualifying load verdict (VERDICT r9 next-step #1): a
  * run on a contended box must stamp its emitted line `degraded: true` so
  * history consumers can filter it (the r9 driver artifact recorded 247.5 s
  * for a tree an idle box times at 110.9 s — a phantom 2.2× "regression"
  * to any reader who did not cross-check the load field by hand). The
  * contract under test is the JSON the consumers parse, so these tests go
  * through the emitted fields, not internals. Jackson (on the Spark
  * classpath) is the parser — hand-rolled containment checks would accept
  * a line no real JSON consumer could read.
  */
class BenchLoadSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val cores = 32

  private def idle = Bench.ChunkLoad(startLoad = 0.4, stealPct = 0.1, externalCores = 0.2)

  test("an idle box is not hot; each contention signal alone flips it") {
    assert(!Bench.isHot(idle, cores))
    // a concurrent stress -c 16 / Verify run: ~16 external cores >> cores/4
    assert(Bench.isHot(idle.copy(externalCores = 16.0), cores))
    // started into an already-saturated box: loadavg past 1.5 * cores/4 —
    // a FIRST-chunk-only trigger (later chunks' loadavg is dominated by
    // the bench's own prior work; ext_cores carries the signal there)
    assert(Bench.isHot(idle.copy(startLoad = 13.0), cores, firstChunk = true))
    assert(!Bench.isHot(idle.copy(startLoad = 13.0), cores),
      "bench-self loadavg must not flag later chunks hot")
    // hypervisor steal
    assert(Bench.isHot(idle.copy(stealPct = 3.5), cores))
    // boundary: exactly at the thresholds is NOT hot (strict >)
    assert(!Bench.isHot(idle.copy(externalCores = cores / 4.0), cores))
    assert(!Bench.isHot(idle.copy(startLoad = 1.5 * cores / 4.0), cores, firstChunk = true))
  }

  test("idle chunks emit degraded=false; one hot chunk degrades the run") {
    val (okJson, okDeg) =
      Bench.loadFieldsJson(Seq(idle, idle, idle), cores, Some(0.1), Some(0.5))
    assert(!okDeg)
    val ok = mapper.readTree(okJson)
    assert(!ok.get("chunk_load").get(0).get("hot").asBoolean)
    assert(ok.get("cores").asInt === cores)
    assert(ok.get("steal_pct").asDouble === 0.1)

    val (hotJson, hotDeg) = Bench.loadFieldsJson(
      Seq(idle, idle.copy(externalCores = 16.0), idle), cores, Some(0.1), Some(9.8))
    assert(hotDeg, "a chunk with 16 external cores busy must degrade the run")
    val hot = mapper.readTree(hotJson)
    assert(hot.get("chunk_load").size === 3)
    assert(hot.get("chunk_load").get(1).get("hot").asBoolean)
    assert(!hot.get("chunk_load").get(0).get("hot").asBoolean)
    assert(hot.get("chunk_load").get(1).get("ext_cores").asDouble === 16.0)
  }

  test("the emitted verdict applies the first-chunk loadavg trigger") {
    // IO-heavy competing load: loadavg-visible (D-state) but invisible to
    // busy-jiffy ext_cores and to steal — the verdict must flag it when the
    // run STARTED into it (chunk 0), same rule as the retry decision
    val ioHot = idle.copy(startLoad = 13.0)
    val (json0, deg0) = Bench.loadFieldsJson(Seq(ioHot, idle), cores, None, None)
    assert(deg0, "chunk-0 loadavg past 1.5*cores/4 must degrade the run")
    assert(mapper.readTree(json0).get("chunk_load").get(0).get("hot").asBoolean)
    // the same loadavg on a LATER chunk is dominated by the bench's own
    // prior-chunk work and must NOT flag (the 4038aae false-positive fix)
    val (json1, deg1) = Bench.loadFieldsJson(Seq(idle, ioHot), cores, None, None)
    assert(!deg1, "bench-self loadavg on later chunks must not degrade the run")
    assert(!mapper.readTree(json1).get("chunk_load").get(1).get("hot").asBoolean)
  }

  test("IO pressure flags a chunk the CPU signals cannot see") {
    // the r10 blind spot (VERDICT r10 next-step #2): D-state/IO contention
    // shows in PSI stall time, never in busy jiffies or steal
    assert(Bench.isHot(idle.copy(ioFullPct = 12.0), cores),
      ">10% full-stall must flag — a CPU-bound chunk cannot self-inflict it")
    assert(Bench.isHot(idle.copy(ioSomePct = 45.0), cores))
    // boundary: exactly at the thresholds is NOT hot (strict >)
    assert(!Bench.isHot(idle.copy(ioFullPct = 10.0), cores))
    assert(!Bench.isHot(idle.copy(ioSomePct = 40.0), cores))
    // the io triggers are verdict-only: the RETRY site passes
    // includeNonRetryable = false (PSI has no per-process attribution, so
    // the bench's own cold-cache reads must not burn the retry budget),
    // while CPU-shaped signals keep retrying either way
    assert(!Bench.isHot(idle.copy(ioFullPct = 50.0), cores, includeNonRetryable = false))
    assert(Bench.isHot(idle.copy(externalCores = 16.0), cores, includeNonRetryable = false))
    // the fields ride the emitted chunk objects (graceful-absence default 0)
    val (json, deg) = Bench.loadFieldsJson(
      Seq(idle, idle.copy(ioFullPct = 12.0, ioSomePct = 30.0)), cores, None, None)
    assert(deg)
    val chunks = mapper.readTree(json).get("chunk_load")
    assert(chunks.get(0).get("io_full_pct").asDouble === 0.0)
    assert(chunks.get(1).get("io_full_pct").asDouble === 12.0)
    assert(chunks.get(1).get("io_some_pct").asDouble === 30.0)
    assert(chunks.get(1).get("hot").asBoolean)
  }

  // ---- history-aware per-query plausibility (VERDICT r10 next-step #1) --

  /** A synthetic clean history line in the BENCH_HISTORY.jsonl format. */
  private def histLine(qs: Map[String, Double], degraded: Boolean = false,
      suspect: Boolean = false): String = {
    val qjson = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"metric":"total","value":1.0,"unit":"sec","degraded":$degraded,""" +
      s""""suspect":$suspect,"queries":$qjson,"sf":"/tmp/sf"}"""
  }

  // five idle entries shaped like the r10 history: two trivial one-scan
  // queries, one mid-cost, one heavy
  private val idleRun = Map(
    "q_hash_sample" -> 0.16, "q_compaction_summary" -> 0.15,
    "q_collocations" -> 0.40, "q_ann_ivfpq" -> 5.7)
  private val idleHistory = Seq.fill(5)(histLine(idleRun))

  test("the r10 scatter fires suspect_queries and the run-level flag") {
    val medians = Bench.historyMedians(idleHistory)
    assert(medians("q_hash_sample") === 0.16)
    // the driver's actual r10 contaminated readings (VERDICT "what's
    // wrong" #1): unchanged queries at 2–9× their idle medians
    val contaminated = Seq(
      "q_hash_sample" -> 0.58, "q_compaction_summary" -> 0.62,
      "q_collocations" -> 3.63, "q_ann_ivfpq" -> 7.8)
    val (sus, runSuspect) = Bench.suspectVerdict(contaminated, medians)
    assert(sus.map(_._1).toSet === Set("q_hash_sample", "q_compaction_summary", "q_collocations"),
      s"the three >2x readings must flag (ivfpq at 1.4x must not): $sus")
    assert(runSuspect,
      "3 trivial-median queries co-inflating IS the contention signature")
    // each flagged query carries its inflation ratio (VERDICT r11 #2) so a
    // consumer can rank severity — 0.1-rounded secs/median
    val ratios = sus.toMap
    assert(ratios("q_collocations") === 9.1, s"3.63/0.40 must read 9.1: $ratios")
    assert(ratios("q_hash_sample") === 3.6)
    assert(ratios("q_compaction_summary") === 4.1)
  }

  test("an idle run emits no suspects; one slow query never flags the run") {
    val medians = Bench.historyMedians(idleHistory)
    // idle repeat: everything within noise of its median
    val (none, ok) = Bench.suspectVerdict(idleRun.toSeq.map {
      case (k, v) => k -> v * 1.2 }, medians)
    assert(none.isEmpty && !ok)
    // ONE query 3x slower: listed (a consumer should look at it) but the
    // RUN is not suspect — a single outlier is as likely a real regression,
    // which the flag must never mask
    val (one, run1) = Bench.suspectVerdict(
      idleRun.updated("q_collocations", 1.3).toSeq, medians)
    assert(one.map(_._1) === Seq("q_collocations") && !run1)
    assert(one.head._2 === 3.3, "1.3/0.40 rounds to 3.3")
    // sub-100ms inflation on a trivial query is jitter, not contention,
    // even past the ratio (0.16 -> 0.25 is 1.56x of... under MinDelta)
    val (tiny, _) = Bench.suspectVerdict(
      Seq("q_hash_sample" -> 0.25), medians)
    assert(tiny.isEmpty, "delta under 0.1s must not flag")
    // failed timings (-1) never flag
    val (fail, _) = Bench.suspectVerdict(Seq("q_collocations" -> -1.0), medians)
    assert(fail.isEmpty)
  }

  test("moderate co-inflation flags one tier down; lone moderates never do") {
    // VERDICT r13 next-step #3: the r13 committed capture carried its
    // 2nd-most-expensive key at 1.8x (median 1.65 s) unflagged — real
    // money left un-adjudicated. The mechanism under test is the
    // 1.7x–2.0x window on >=0.4 s medians, gated on a co-inflation quorum
    val medians = Map("q_heavy" -> 1.65, "q_mid" -> 0.45, "q_other" -> 0.60,
      "q_tiny" -> 0.16, "q_cheap" -> 0.05)
    // three moderate (1.7x–2.0x) inflations on >=0.4 s medians co-inflate:
    // all three must flag even though none clears tier 1's 2.0x bar
    val (sus, runFlag) = Bench.suspectVerdict(Seq(
      "q_heavy" -> 3.0, "q_mid" -> 0.81, "q_other" -> 1.08), medians)
    assert(sus.map(_._1) === Seq("q_heavy", "q_mid", "q_other"),
      s"3 co-inflating moderates must all flag: $sus")
    assert(sus.toMap.apply("q_heavy") === 1.8)
    // ...but the RUN-level stamp counts tier-1 trivial flags only: tier 2
    // widens what gets retimed, never the documented >=3-trivials-past-2x
    // run signature (q_mid's 0.45 s median is trivial, yet its 1.8x tier-2
    // flag must not help stamp the run — a suspect entry is excluded from
    // the history baseline, so lowering that bar would make a genuine
    // shared-trunk 1.8x regression re-flag every run until the all-suspect
    // escape re-converged)
    assert(!runFlag, "tier-2-only flags must never stamp the run suspect")
    // only TWO moderates: below the quorum, neither flags (a pair of 1.8x
    // readings is not yet the contention signature)
    val (two, _) = Bench.suspectVerdict(Seq(
      "q_heavy" -> 3.0, "q_mid" -> 0.81), medians)
    assert(two.isEmpty, s"2 moderates are under the co-inflation quorum: $two")
    // a LONE moderate never flags — as likely a real regression
    val (one, flag1) = Bench.suspectVerdict(Seq("q_heavy" -> 3.0), medians)
    assert(one.isEmpty && !flag1)
    // tier-1 flags count toward the moderate quorum (a 2.5x on a >=0.4 s
    // median is a fortiori moderate): 2 moderates + 1 tier-1 = 3
    val (mixed, _) = Bench.suspectVerdict(Seq(
      "q_heavy" -> 3.0, "q_mid" -> 0.81, "q_other" -> 1.55), medians)
    assert(mixed.map(_._1) === Seq("q_heavy", "q_mid", "q_other"),
      s"tier-1 q_other at 2.6x must complete the quorum: $mixed")
    // ...and the combined list carries no duplicate for a query that
    // satisfies both tiers
    assert(mixed.map(_._1).distinct === mixed.map(_._1))
    // sub-0.4 s medians never enter tier 2 (that band belongs to the
    // trivial co-inflation rule, which needs the full 2.0x)
    val (tiny, _) = Bench.suspectVerdict(Seq(
      "q_tiny" -> 0.29, "q_cheap" -> 0.09, "q_mid" -> 0.81), medians)
    assert(tiny.isEmpty,
      s"1.8x on trivial medians must not flag via the moderate tier: $tiny")
    // tier 1 keeps flagging unconditionally regardless of any quorum
    val (t1, _) = Bench.suspectVerdict(Seq("q_heavy" -> 4.0), medians)
    assert(t1.map(_._1) === Seq("q_heavy"), "2.4x flags alone via tier 1")
  }

  test("retimeCleanVerdict is tri-state and demands evidence for every flag") {
    val medians = Map("q_a" -> 0.2, "q_b" -> 1.0, "q_m" -> 0.5)
    val flagged = Seq("q_a" -> 3.0, "q_b" -> 2.5)
    // nothing flagged: no adjudication ran -> None (null in the line)
    assert(Bench.retimeCleanVerdict(Nil, Nil, medians).isEmpty)
    // every retime back inside its band -> clean
    assert(Bench.retimeCleanVerdict(flagged,
      Seq("q_a" -> 0.22, "q_b" -> 1.1), medians) === Some(true))
    // one retime still tier-1 inflated -> not clean
    assert(Bench.retimeCleanVerdict(flagged,
      Seq("q_a" -> 0.22, "q_b" -> 2.6), medians) === Some(false))
    // a retime in the MODERATE band (1.7x–2.0x on a >=0.4 s median) is
    // still inflated — "clean" must mean "would re-flag under neither
    // tier", not merely "under 2x"
    assert(Bench.retimeCleanVerdict(Seq("q_m" -> 2.2),
      Seq("q_m" -> 0.9), medians) === Some(false))
    assert(Bench.retimeCleanVerdict(Seq("q_m" -> 2.2),
      Seq("q_m" -> 0.55), medians) === Some(true))
    // an errored retime (-1) is not evidence
    assert(Bench.retimeCleanVerdict(flagged,
      Seq("q_a" -> 0.22, "q_b" -> -1.0), medians) === Some(false))
    // a flagged query the RetimeCap dropped has no retime at all — absence
    // of evidence must never read as clean
    assert(Bench.retimeCleanVerdict(flagged,
      Seq("q_a" -> 0.22), medians) === Some(false))
    // the tri-state JSON rendering
    assert(Bench.triState(None) === "null")
    assert(Bench.triState(Some(true)) === "true")
    assert(Bench.triState(Some(false)) === "false")
  }

  test("contaminated and thin history never feeds the medians") {
    // degraded/suspect entries are skipped even when they are the tail
    val dirty = idleHistory ++ Seq(
      histLine(idleRun.map { case (k, v) => k -> v * 5 }, degraded = true),
      histLine(idleRun.map { case (k, v) => k -> v * 5 }, suspect = true),
      "not json at all {{{")
    assert(Bench.historyMedians(dirty)("q_hash_sample") === 0.16)
    // a query with fewer than MinSamples clean readings gets no verdict
    val thin = Seq.fill(2)(histLine(Map("q_new" -> 0.1)))
    assert(!Bench.historyMedians(thin).contains("q_new"))
    // failed (-1) history values never enter a median
    val withFail = Seq.fill(5)(histLine(Map("q_x" -> -1.0)))
    assert(!Bench.historyMedians(withFail).contains("q_x"))
    // the window keeps the LAST N clean entries: an old regression-era
    // median must not outvote five fresh entries
    val drifted = Seq.fill(10)(histLine(Map("q_y" -> 9.0))) ++
      Seq.fill(5)(histLine(Map("q_y" -> 1.0)))
    assert(Bench.historyMedians(drifted)("q_y") === 1.0)
    // a dev run appended at another scale factor must never feed the
    // medians that judge a driver sf0.1 capture (histLine stamps /tmp/sf)
    assert(Bench.historyMedians(idleHistory, sf = Some("/tmp/sf"))("q_hash_sample") === 0.16)
    assert(Bench.historyMedians(idleHistory, sf = Some("/root/testdata/sf0.1")).isEmpty)
    // a WHOLLY pre-sf history is grandfathered: excluding every unstamped
    // entry would mean no baseline at all
    val noSf = Seq.fill(5)("""{"degraded":false,"queries":{"q_old":2.0}}""")
    assert(Bench.historyMedians(noSf, sf = Some("/tmp/sf"))("q_old") === 2.0)
    // ...but the moment ANY entry is sf-stamped, unstamped entries count
    // as mismatches (ADVICE r11): "absent matches anything" let legacy
    // dev-scale lines keep feeding the medians that judge an sf0.1 capture
    val mixed = noSf ++ Seq.fill(2)(histLine(Map("q_old" -> 9.0)))
    assert(Bench.historyMedians(mixed, sf = Some("/tmp/sf")) ===
      Map.empty[String, Double],
      "2 stamped samples are under MinSamples; the 5 unstamped must not fill in")
    val mixedEnough = noSf ++ Seq.fill(3)(histLine(Map("q_old" -> 9.0)))
    assert(Bench.historyMedians(mixedEnough, sf = Some("/tmp/sf"))("q_old") === 9.0,
      "stamped-only baseline once stamped entries exist")
    // the stamp-era test reads EVERY parsed line: a stamped-but-DEGRADED
    // entry proves the era began (it just cannot feed a median), so the
    // unstamped legacy lines are already out even though no stamped entry
    // is itself baseline-eligible
    val eraByDegraded = noSf ++
      Seq(histLine(Map("q_old" -> 9.0), degraded = true))
    assert(Bench.historyMedians(eraByDegraded, sf = Some("/tmp/sf")) ===
      Map.empty[String, Double],
      "a stamped degraded entry must end the grandfather era")
  }

  test("a persistent shift escapes the suspect lock-in as the new normal") {
    // a real config/JVM change slows the trivial queries 3x FOR GOOD: the
    // first post-shift runs flag suspect against the old medians...
    val shifted = idleRun.map { case (k, v) => k -> v * 3 }
    val (sus0, run0) = Bench.suspectVerdict(shifted.toSeq,
      Bench.historyMedians(idleHistory))
    assert(run0, "the shift must flag against the pre-shift baseline")
    assert(sus0.nonEmpty)
    // ...but once the window's worth of consecutive suspect entries have
    // accumulated, THEY become the baseline — the next identical run is
    // clean again instead of suspect forever (degraded entries in between
    // are ignored, not baseline material)
    val lockedIn = idleHistory ++
      Seq(histLine(shifted, degraded = true)) ++
      Seq.fill(5)(histLine(shifted, suspect = true))
    val newNormal = Bench.historyMedians(lockedIn)
    assert(newNormal("q_collocations") === shifted("q_collocations"),
      s"the suspect window must have become the baseline: $newNormal")
    val (sus1, run1) = Bench.suspectVerdict(shifted.toSeq, newNormal)
    assert(sus1.isEmpty && !run1, "the new normal must judge itself clean")
    // a TRANSIENT contamination cannot trip the escape: one clean entry
    // inside the recent window keeps the clean-only baseline
    val transient = idleHistory ++
      Seq.fill(3)(histLine(shifted, suspect = true)) ++
      Seq(histLine(idleRun)) ++
      Seq(histLine(shifted, suspect = true))
    assert(Bench.historyMedians(transient)("q_collocations") === 0.40,
      "clean neighbors must keep the clean baseline")
  }

  // ---- phase sub-timings (VERDICT r10 next-step #5) ----------------------

  test("Phases capture attributes eager stages and is a no-op outside one") {
    // outside a capture: timed is transparent
    assert(Phases.timed("x")(41 + 1) === 42)
    val (res, phases) = Phases.capture {
      Phases.timed("train")(Thread.sleep(5))
      Phases.timed("search")(Thread.sleep(5))
      Phases.timed("train")(Thread.sleep(5)) // re-entry accumulates
      "done"
    }
    assert(res === "done")
    assert(phases.map(_._1) === Seq("train", "search"), "first-recorded order")
    val m = phases.toMap
    assert(m("train") >= 0.010 && m("search") >= 0.005)
    // a capture must not leak to the next one
    assert(Phases.capture(7)._2.isEmpty)
  }

  test("GRAFT_BENCH_QUERIES subsets the run; an all-unknown list is a hard error") {
    // dev/e2e plumbing (BenchE2eSpec rides it): unknown names drop with a
    // warning; an unset/blank variable means the FULL sorted surface; a
    // NON-EMPTY list resolving to zero known names must THROW (ADVICE r14
    // #1 — the old silent fallback turned a typo'd subset run into a full
    // run that overwrote BENCH_FULL.json and appended real history)
    val all = SparkEntry.queries.keys.toSeq.sorted
    assert(Bench.benchQueryNames(None) === all)
    assert(Bench.benchQueryNames(Some("")) === all)
    assert(Bench.benchQueryNames(Some("   ")) === all)
    assertThrows[IllegalArgumentException] {
      Bench.benchQueryNames(Some("q_no_such,also_junk"))
    }
    assert(Bench.benchQueryNames(Some("q_count_rows, q_add_literal")) ===
      Seq("q_add_literal", "q_count_rows"), "trimmed, filtered, sorted")
    assert(Bench.benchQueryNames(Some("q_count_rows,q_bogus")) ===
      Seq("q_count_rows"), "unknown names drop silently")
    // duplicates collapse: a repeated name would be timed and counted
    // twice (inflating total, duplicating JSON keys, and double-feeding
    // the co-inflation quorum), and padding a partial list with repeats
    // must never reach full-surface size and defeat the subset guard
    assert(Bench.benchQueryNames(Some("q_count_rows,q_count_rows")) ===
      Seq("q_count_rows"), "duplicate names must collapse")
  }

  test("every PhasedQueries entry is a live graded key") {
    // the diagnostic-capture allowlist is maintained by hand; a renamed
    // query would otherwise silently stop shipping its phase split
    val live = SparkEntry.queries.keySet
    assert(Bench.PhasedQueries.subsetOf(live),
      s"stale PhasedQueries entries: ${Bench.PhasedQueries -- live}")
  }

  test("the GRAFT_PH wire format round-trips and rides a parseable line") {
    val ph = Bench.parsePhases("train_coarse=1.25;train_pq=2.5;encode_write=0.75")
    assert(ph === Seq("train_coarse" -> 1.25, "train_pq" -> 2.5, "encode_write" -> 0.75))
    assert(Bench.parsePhases("").isEmpty)
    // the artifact block: phases keyed by query beside the scalar queries
    // map (totals unchanged — the consumer contract)
    val line =
      s"""{"metric":"total","value":8.2,"queries":{"q_ann_ivfpq":8.2},""" +
        s""""phases":{"q_ann_ivfpq":{"train_coarse":1.25,"train_pq":2.5}},"errors":{}}"""
    val node = mapper.readTree(line)
    assert(node.get("queries").get("q_ann_ivfpq").asDouble === 8.2)
    assert(node.get("phases").get("q_ann_ivfpq").get("train_pq").asDouble === 2.5)
  }

  // ---- streaming history (VERDICT r10 next-step #4) ----------------------

  test("streaming records keep a snapshot AND an append-only history") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-hist")
    try {
      val l1 = """{"metric":"streaming_smoke","value":1.0,"suites":7,"failed":1}"""
      val l2 = """{"metric":"streaming_smoke","value":0.9,"suites":7,"failed":0}"""
      Bench.writeStreamingRecord(l1, dir.toString)
      Bench.writeStreamingRecord(l2, dir.toString)
      val snap = java.nio.file.Files.readString(dir.resolve("STREAMING.json"))
        .linesIterator.toSeq
      assert(snap === Seq(l2), "snapshot must hold exactly the latest line")
      val hist = java.nio.file.Files
        .readString(dir.resolve("STREAMING_HISTORY.jsonl")).linesIterator.toSeq
      assert(hist === Seq(l1, l2),
        "history must keep both runs — the red->green flip r10 could not see")
      hist.foreach { l =>
        val n = mapper.readTree(l)
        assert(n.get("metric").asText === "streaming_smoke")
        assert(n.get("suites").asInt === 7)
      }
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }

  // ---- the driver-parseable closing sequence (VERDICT r11 next-step #1) --

  test("the closing stdout sequence ends on the compact total, after headline and smoke") {
    // every BENCH_r*.json through r12 was parsed:null — r8–r11 because
    // startup spew pushed the metric lines out of the driver's 2000-char
    // tail, r12 (headline already last) because the parser rejects sbt's
    // log prefix and plausibly keys on "metric":"total". Main prints
    // through closingLines, whose contract is: smoke lines, then the
    // total_short headline, then the compact total as the ABSOLUTE last
    // program output.
    val headline = """{"metric":"total_short","value":1.0,"sf":"/tmp/sf"}"""
    val closing  = """{"metric":"total","value":1.0,"sf":"/tmp/sf"}"""
    val smoke = Seq("""{"metric":"streaming_smoke","failed":0}""")
    assert(Bench.closingLines(headline, closing, smoke) ===
      smoke ++ Seq(headline, closing))
    assert(Bench.closingLines(headline, closing, Nil) === Seq(headline, closing),
      "a skipped smoke still ends headline-then-total")
  }

  test("the compact closing total parses, is tail-sized, and keys metric=total") {
    val streaming = Bench.streamingRegression(
      Some("""{"metric":"streaming_smoke","failed":0}"""),
      Seq("""{"metric":"streaming_smoke","failed":0}"""))
    val line = Bench.closingTotalLine(total = 148.553, degraded = false,
      suspect = true, retimeClean = Some(true), retimeHot = Some(false),
      envInflated = Some(false), band = "[97.2,107.1]",
      run = 144, failed = 0,
      sfDir = "/root/testdata/sf0.1", streamingFields = streaming,
      wallSec = 612.34, skipped = 0)
    val n = mapper.readTree(line)
    // r16: the protocol's own wall cost is a published number (VERDICT r15
    // next-step #3) and the deadline's skip count is tail-visible (#1)
    assert(n.get("wall_sec").asDouble === 612.3)
    assert(n.get("queries_skipped").asInt === 0)
    assert(n.get("partial") === null,
      "the FINAL closing line drops the partial stamp entirely — absent, not false")
    assert(n.get("metric").asText === "total",
      "the tail parser's most plausible key is the full record's own name")
    assert(n.get("value").asDouble === 148.553)
    assert(n.get("queries_run").asInt === 144)
    assert(n.get("suspect").asBoolean === true)
    // VERDICT r13 #1: the r13 tail read suspect:true for a run whose own
    // retime pass proved every flag ambient — the adjudication now rides
    // the tail-visible line itself
    assert(n.get("retime_clean").asBoolean === true)
    assert(n.get("retime_hot").asBoolean === false)
    // VERDICT r14 #2/#3: the plan-independent env verdict and the clean
    // band make the line self-contextualizing for a tail-only consumer
    assert(n.get("env_inflated").asBoolean === false)
    assert(n.get("band").get(0).asDouble === 97.2)
    assert(n.get("band").get(1).asDouble === 107.1)
    assert(n.get("streaming_failed").asInt === 0)
    assert(n.get("sf").asText === "/root/testdata/sf0.1")
    assert(n.get("queries") === null, "no per-query map — that is what keeps it compact")
    // the binding constraint: this line + sbt's ~90-char [success] trailer
    // must ALWAYS fit the driver's 2000-char stdout tail together
    assert(line.length < 600, s"closing total must stay tail-sized: ${line.length}")
    assert(line.startsWith("""{"metric":"total","value":"""),
      "prefix pinned — a tail parser may match on it")
    // a SKIPPED smoke rides null streaming fields — the closing line must
    // still parse (nulls are valid JSON; a formatting slip here would
    // resurrect parsed:null exactly when the smoke is off); an unflagged
    // run likewise rides tri-state null adjudication fields, and a
    // bandless trail a literal null band
    val skipped = Bench.closingTotalLine(total = 1.0, degraded = false,
      suspect = false, retimeClean = None, retimeHot = None,
      envInflated = None, band = "null",
      run = 144, failed = 0, sfDir = "/tmp/sf",
      streamingFields = Bench.streamingRegression(None, Nil))
    val sn = mapper.readTree(skipped)
    assert(sn.get("streaming_failed").isNull && sn.get("metric").asText === "total")
    assert(sn.get("retime_clean").isNull && sn.get("retime_hot").isNull,
      "no flags -> no adjudication -> null, never a fake clean/dirty")
    assert(sn.get("env_inflated").isNull && sn.get("band").isNull,
      "no baseline -> unknown, never a fake clean band/verdict")
    // the remaining tri-state arm: a retime that stayed inflated (or never
    // ran for a capped/errored flag) must read explicitly false
    val dirty = mapper.readTree(Bench.closingTotalLine(total = 1.0,
      degraded = false, suspect = true, retimeClean = Some(false),
      retimeHot = Some(true), envInflated = Some(true), band = "[1.0,1.1]",
      run = 144, failed = 0, sfDir = "/tmp/sf",
      streamingFields = Bench.streamingRegression(None, Nil)))
    assert(dirty.get("retime_clean").asBoolean === false)
    assert(dirty.get("retime_hot").asBoolean === true)
    assert(dirty.get("env_inflated").asBoolean === true,
      "the r14 reading: still-inflated retimes + fixed workloads slow = environmental")
  }

  test("the closing total stays under the byte budget at worst-case widths") {
    // VERDICT r13 next-step #2: now that the tail parser works, the
    // biggest regression risk is the closing line growing past the
    // driver's 2000-char window (it must fit TOGETHER with sbt's
    // [success] trailer and any stderr burst sharing the pipe). Pin a
    // hard budget with every numeric field at its widest plausible
    // rendering and every tri-state/streaming field non-null.
    val worstStreaming = Bench.streamingRegression(
      Some("""{"metric":"streaming_smoke","failed":999999}"""),
      Seq("""{"metric":"streaming_smoke","failed":999999}"""))
    val line = Bench.closingTotalLine(total = 8640000.123456789,
      degraded = true, suspect = true, retimeClean = Some(false),
      retimeHot = Some(false), envInflated = Some(false),
      band = "[8640000.1,8640000.9]", run = 999999, failed = 999999,
      sfDir = "/very/long/testdata/path/that/should/never/happen/sf0.0000001",
      streamingFields = worstStreaming, wallSec = 8640000.123456789,
      skipped = 999999, partial = true)
    assert(mapper.readTree(line).get("metric").asText === "total")
    assert(line.length < 700,
      s"worst-case closing total must stay under the 700-byte budget: ${line.length}")
  }

  test("emitClosing writes the closing sequence and nothing else, ending on the total") {
    // main's last statement is emitClosing; this pins that the emitted
    // stream IS closingLines' order — smoke, headline, compact total —
    // with the total as the final write (the driver's tail parser keys on
    // it; anything printed after it would resurrect parsed:null)
    val headline = """{"metric":"total_short","value":1.0,"sf":"/tmp/sf"}"""
    val closing  = """{"metric":"total","value":1.0,"sf":"/tmp/sf"}"""
    val smoke = Seq("""{"metric":"streaming_smoke","failed":0}""")
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    Bench.emitClosing(headline, closing, smoke, got += _)
    assert(got.toSeq === smoke ++ Seq(headline, closing))
    assert(got.last === closing, "the compact total must be the final write")
    val gotNoSmoke = scala.collection.mutable.ArrayBuffer.empty[String]
    Bench.emitClosing(headline, closing, Nil, gotNoSmoke += _)
    assert(gotNoSmoke.last === closing)
  }

  test("retimed re-readings ride the headline as an additive map") {
    // VERDICT r12 #2: a suspect capture re-times JUST the flagged queries
    // once and publishes the re-readings beside suspect_ratios — the
    // original value/queries stay untouched (additive adjudication
    // evidence, never a do-over)
    assert(Bench.retimedFieldJson(Nil) === "{}")
    val body = Bench.retimedFieldJson(Seq("q_hybrid_rrf" -> 2.31,
      "q_hopping_window" -> 0.38, "q_broken" -> -1.0))
    val line = s"""{"metric":"total_short","value":148.5,"suspect":true,"retimed":$body,"sf":"/tmp/sf"}"""
    val n = mapper.readTree(line)
    assert(n.get("retimed").get("q_hybrid_rrf").asDouble === 2.31)
    assert(n.get("retimed").get("q_hopping_window").asDouble === 0.38)
    assert(n.get("retimed").get("q_broken").asDouble === -1.0,
      "a failed retime must read as a failure, not vanish")
    assert(n.get("value").asDouble === 148.5,
      "the published total stays the original capture's")
    // the pass is cost-bounded, worst-ratio-first: a fully-saturated box
    // flagging most of the surface must not double the run
    val many = (1 to 40).map(i => (f"q_$i%02d", i / 10.0 + 2.0))
    val targets = Bench.retimeTargets(many)
    assert(targets.size === Bench.RetimeCap)
    assert(targets.head === "q_40", "worst inflation retimes first")
    assert(!targets.contains("q_01"), "the mildest inflation is what drops")
    assert(Bench.retimeTargets(Seq("q_b" -> 3.0, "q_a" -> 3.0)) ===
      Seq("q_a", "q_b"), "equal ratios tiebreak by name for determinism")
  }

  test("suspect_ratios and streaming fields ride a parseable headline") {
    val smokeNow  = Some("""{"metric":"streaming_smoke","value":30.5,"suites":7,"failed":1}""")
    val smokePrev = Seq("""{"metric":"streaming_smoke","value":29.9,"suites":7,"failed":0}""")
    // streaming fields ride at the END: the final line's byte prefix must
    // stay the historical {"metric":"total_short","value":… shape
    val line = s"""{"metric":"total_short","value":100.5,"suspect":true,""" +
      s""""suspect_queries":["q_a","q_b"],"suspect_ratios":{"q_a":5.2,"q_b":2.4},""" +
      s""""sf":"/tmp/sf",${Bench.streamingRegression(smokeNow, smokePrev)}}"""
    assert(line.startsWith("""{"metric":"total_short","value":"""),
      "appending the streaming fields must not disturb the headline prefix")
    val n = mapper.readTree(line)
    assert(n.get("streaming_failed").asInt === 1)
    assert(n.get("streaming_prev_failed").asInt === 0)
    assert(n.get("streaming_regressed").asBoolean === true,
      "0 -> 1 failed between captures IS the red flap the field exists for")
    assert(n.get("suspect_ratios").get("q_a").asDouble === 5.2)
    assert(n.get("suspect_queries").get(0).asText === "q_a")
  }

  test("streaming regression reads unknown — not clean — when a side is missing") {
    val greenL = """{"metric":"streaming_smoke","failed":0}"""
    val redL   = """{"metric":"streaming_smoke","failed":2}"""
    val skipL  = """{"metric":"streaming_smoke","skipped":true,"reason":"timeout"}"""
    val green  = Some(greenL)
    def node(cur: Option[String], prev: Seq[String]) =
      mapper.readTree(s"""{"sf":"x",${Bench.streamingRegression(cur, prev)}}""")
    // green -> green: explicit false
    assert(node(green, Seq(greenL)).get("streaming_regressed").asBoolean === false)
    // recovering run (red -> green) is not a regression
    assert(node(green, Seq(redL)).get("streaming_regressed").asBoolean === false)
    // ...and going red IS one
    assert(node(Some(redL), Seq(greenL)).get("streaming_regressed").asBoolean === true)
    // no prior entry / skipped smoke / unparseable sides: null, never false
    assert(node(green, Nil).get("streaming_regressed").isNull)
    assert(node(None, Seq(greenL)).get("streaming_regressed").isNull)
    assert(node(None, Seq(greenL)).get("streaming_failed").isNull)
    assert(node(Some("not json"), Seq(greenL)).get("streaming_regressed").isNull)
    // a current-side skip record (no `failed` field) must not parse as failed=0
    assert(node(Some(skipL), Seq(greenL)).get("streaming_failed").isNull)
    assert(node(Some(skipL), Seq(greenL)).get("streaming_regressed").isNull)
    // the PREVIOUS baseline scans back past skip/timeout records to the
    // last entry that actually reported — a wedged smoke last round must
    // not blind this round's comparison
    val n = node(Some(redL), Seq(redL, greenL, skipL))
    assert(n.get("streaming_prev_failed").asInt === 0,
      "baseline must be the last REPORTING entry, not the skip record")
    assert(n.get("streaming_regressed").asBoolean === true)
    // a history of only skip records reads unknown
    assert(node(green, Seq(skipL, skipL)).get("streaming_regressed").isNull)
  }

  test("HistoryReport adjudicates the latest entry against the prior clean baseline") {
    // the report must reuse the LIVE median logic (read-before-append:
    // the latest entry judges against everything before it) and sort worst
    // inflation first — the table a round review builds by hand
    val hist = idleHistory :+ histLine(idleRun ++ Map(
      "q_collocations" -> 1.2, "q_hash_sample" -> 0.17))
    val rep = graft.tools.HistoryReport.report(hist)
    assert(rep.contains("x 3.00"), s"collocations at 3x its 0.40 median must lead: $rep")
    val worstBlock = rep.split("worst first")(1)
    assert(worstBlock.linesIterator.toSeq(1).startsWith("q_collocations"),
      "worst inflation must sort first")
    assert(rep.contains("suspect=false"))
    // degenerate inputs answer text, never throw
    assert(graft.tools.HistoryReport.report(Nil).nonEmpty)
    assert(graft.tools.HistoryReport.report(Seq("{not json")).nonEmpty)
    assert(graft.tools.HistoryReport.report(
      Seq("""{"metric":"total","value":1.0}""")).contains("no queries map"))
  }

  test("HistoryReport never lets the adjudicated entry feed its own baseline") {
    // ADVICE r12: with a truncated (unparseable) final append, parsed.last
    // is the PREVIOUS line — dropping only the raw last line left the
    // adjudicated entry inside the baseline, partially judging itself.
    // Pin via the min-samples rule: 2 clean entries + the adjudicated one
    // + trailing garbage. Self-inclusion hands every query a 3rd sample —
    // enough to mint a (self-fed) median and print a verdict row; the fix
    // leaves 2 clean samples, below SuspectMinSamples, so the adjudicated
    // entry must come back UNJUDGED, never self-judged.
    val short = Seq.fill(2)(histLine(idleRun)) ++
      Seq(histLine(idleRun ++ Map("q_collocations" -> 1.2)), "{truncated garb")
    val rep = graft.tools.HistoryReport.report(short)
    assert(!rep.contains("x 3.00"),
      s"a verdict row here can only come from a self-fed median: $rep")
    assert(rep.contains("no clean baseline yet"),
      s"thin history must read 'unjudged', not judge itself: $rep")
  }

  test("HistoryReport prints the tree's clean band in its header") {
    // VERDICT r13 next-step #6: the clean-entry band ("97–107 s") used to
    // be re-derived by hand each round; now the tool prints it — min-max
    // of non-suspect, non-degraded, same-sf totals, contaminated and
    // other-sf entries excluded
    def line(v: Double, degraded: Boolean = false, suspect: Boolean = false,
        sf: String = "/tmp/sf") =
      s"""{"metric":"total","value":$v,"unit":"sec","degraded":$degraded,""" +
        s""""suspect":$suspect,"queries":{"q_x":0.1},"sf":"$sf"}"""
    val rep = graft.tools.HistoryReport.report(Seq(
      line(97.2), line(105.9),
      line(150.0, degraded = true), line(140.0, suspect = true),
      line(50.0, sf = "/other/sf"),
      line(100.0)))
    assert(rep.contains("clean band (sf=/tmp/sf, last 3 clean): 97.2-105.9 s"),
      s"band must be min-max over the 3 clean same-sf totals: $rep")
    // the band is WINDOWED to the 10 most recent clean entries: a pre-flag
    // contaminated total from an ancient tree must not stretch it forever
    // (the live trail's unwindowed band read 89-248 s off one such entry)
    val old = Seq(line(247.5)) ++ (1 to 10).map(_ => line(100.0))
    val windowed = graft.tools.HistoryReport.report(old :+ line(99.0))
    assert(windowed.contains("last 10 clean): 99.0-100.0 s"),
      s"the 247.5 s entry is outside the 10-entry window: $windowed")
    // a trail with no clean same-sf entry says so instead of a fake band
    val dirty = graft.tools.HistoryReport.report(
      Seq(line(150.0, degraded = true)))
    assert(dirty.contains("no clean entries"), dirty)
  }

  test("HistoryReport surfaces retimed re-readings beside the flagged timing") {
    val latest = s"""{"metric":"total","value":9.9,"unit":"sec","suspect":true,""" +
      s""""queries":{"q_collocations":1.2,"q_hash_sample":0.16},""" +
      s""""retimed":{"q_collocations":0.41},"sf":"/tmp/sf"}"""
    val rep = graft.tools.HistoryReport.report(idleHistory :+ latest)
    assert(rep.contains("retimed   0.41 s"),
      s"the adjudication must read off the row, no reach into history: $rep")
    // the run trail surfaces the tri-state when an entry carries it (r14)
    // and stays silent when it does not (pre-r14 entries have no field)
    val adjudicated = latest.replace(""""suspect":true""",
      """"suspect":true,"retime_clean":false,"retime_hot":true""")
    val rep2 = graft.tools.HistoryReport.report(idleHistory :+ adjudicated)
    assert(rep2.contains("retime_clean=false  retime_hot=true"), rep2)
    assert(!rep.contains("retime_clean"), "absent field must not print")
  }

  test("HistoryReport shows the flagged query's own steal window") {
    // burst contention (r15): a 2-second 100% steal burst inside a
    // 3-minute chunk averages ~1% — under every chunk threshold — yet
    // makes a 0.4 s query read 18x; the per-query steal window is the
    // evidence, shown beside the inflated row
    val latest = s"""{"metric":"total","value":9.9,"unit":"sec","suspect":true,""" +
      s""""queries":{"q_collocations":3.6,"q_hash_sample":0.16},""" +
      s""""query_steal":{"q_collocations":23.4,"q_hash_sample":0.4},""" +
      s""""sf":"/tmp/sf"}"""
    val rep = graft.tools.HistoryReport.report(idleHistory :+ latest)
    assert(rep.contains("steal 23.4%"),
      s"material steal in the query's own window must read off the row: $rep")
    assert(!rep.contains("steal 0.4%"),
      "sub-1% steal is noise, not evidence — stays silent")
  }

  // ---- invisible-contention sensors + env adjudication (VERDICT r14) ----

  test("cpu-PSI, cgroup throttle, and the calib probe flag what r14's sensors missed") {
    // the r14 capture: 2.6x the clean band with ext_cores 0, steal 0.26%,
    // io-PSI ~0 — every trigger quiet. The three r15 sensors each catch a
    // mode of that signature.
    assert(!Bench.isHot(idle, cores), "baseline: idle stays not hot")
    // cpu-PSI some-stall: runnable-but-not-running sees queueing no matter
    // who the contender is; the floor sits above bench-self oversubscription
    assert(Bench.isHot(idle.copy(cpuSomePct = 30.0), cores))
    assert(!Bench.isHot(idle.copy(cpuSomePct = Bench.CpuPsiHotPct), cores),
      "exactly at the floor is NOT hot (strict >)")
    // cpu pressure is a retryable (CPU-shaped) signal — a competitor can go
    assert(Bench.isHot(idle.copy(cpuSomePct = 30.0), cores,
      includeNonRetryable = false))
    // cgroup throttling: measures the quota, not the plan — verdict-only
    // (a retry cannot outwait a static quota)
    assert(Bench.isHot(idle.copy(throttledPct = 6.0), cores))
    assert(!Bench.isHot(idle.copy(throttledPct = 6.0), cores,
      includeNonRetryable = false))
    assert(!Bench.isHot(idle.copy(throttledPct = Bench.ThrottleHotPct), cores))
    // the calibration probe judges against the clean-history reference:
    // no reference, no verdict — a first run can never self-flag on it
    val slowProbe = idle.copy(calibSec = 0.35)
    assert(!Bench.isHot(slowProbe, cores), "no calibRef -> calib never triggers")
    assert(Bench.isHot(slowProbe, cores, calibRef = Some(0.2)),
      "0.35 s probe vs 0.2 s baseline is 1.75x — hot")
    assert(!Bench.isHot(idle.copy(calibSec = 0.25), cores, calibRef = Some(0.2)),
      "1.25x is inside the probe's noise band")
    assert(!Bench.isHot(idle.copy(calibSec = 0.3), cores, calibRef = Some(0.2)),
      "exactly 1.5x is NOT hot (strict >)")
    assert(!Bench.isHot(idle.copy(calibSec = 0.06), cores, calibRef = Some(0.02)),
      "a 40 ms delta is jitter even at 3x — the absolute floor holds")
    assert(Bench.isHot(slowProbe, cores, calibRef = Some(0.2),
      includeNonRetryable = false), "the calib trigger is retryable")
  }

  test("loadFieldsJson publishes the new sensors and the calib reference") {
    val c = idle.copy(cpuSomePct = 3.2, throttledPct = 0.0, calibSec = 0.21)
    val (json, deg) = Bench.loadFieldsJson(Seq(c), cores, None, None,
      calibRef = Some(0.2))
    assert(!deg)
    val n = mapper.readTree(json)
    assert(n.get("calib_ref").asDouble === 0.2,
      "the baseline the chunk verdicts used must ride the line")
    val chunk = n.get("chunk_load").get(0)
    assert(chunk.get("cpu_some_pct").asDouble === 3.2)
    assert(chunk.get("throttled_pct").asDouble === 0.0)
    assert(chunk.get("calib_sec").asDouble === 0.21)
    assert(!chunk.get("hot").asBoolean)
    // an inflated probe degrades the run through the same plumbing
    val (hotJson, hotDeg) = Bench.loadFieldsJson(
      Seq(c.copy(calibSec = 0.5)), cores, None, None, calibRef = Some(0.2))
    assert(hotDeg, "2.5x probe inflation must degrade the run")
    assert(mapper.readTree(hotJson).get("chunk_load").get(0).get("hot").asBoolean)
    // without a reference the same chunk publishes no calib_ref and stays
    // unjudged on the probe
    val (noRef, noRefDeg) = Bench.loadFieldsJson(
      Seq(c.copy(calibSec = 0.5)), cores, None, None)
    assert(!noRefDeg && mapper.readTree(noRef).get("calib_ref") === null)
  }

  /** A history line with per-chunk calib probes in the r15 load shape. */
  private def calLine(calibs: Seq[Double], degraded: Boolean = false,
      suspect: Boolean = false, sf: String = "/tmp/sf"): String =
    s"""{"metric":"total","value":100.0,"degraded":$degraded,""" +
      s""""suspect":$suspect,"queries":{"q_x":0.1},""" +
      s""""load":{"cores":32,"chunk_load":[""" +
      calibs.map(c => s"""{"load":0.1,"calib_sec":$c,"hot":false}""")
        .mkString(",") + s"""]},"sf":"$sf"}"""

  test("calibBaseline pools clean same-sf probes and refuses thin history") {
    val hist = Seq(calLine(Seq(0.2, 0.22)), calLine(Seq(0.21, 0.2)))
    assert(Bench.calibBaseline(hist, sf = Some("/tmp/sf")) === Some(0.21),
      "median of the pooled chunk probes")
    // contaminated entries never feed the yardstick that judges the next run
    val dirty = hist ++ Seq(calLine(Seq(0.9, 0.95), suspect = true),
      calLine(Seq(0.8), degraded = true))
    assert(Bench.calibBaseline(dirty, sf = Some("/tmp/sf")) === Some(0.21))
    // other-sf entries are not baseline material
    assert(Bench.calibBaseline(hist, sf = Some("/other")) === None)
    // below SuspectMinSamples probe values: no baseline, no verdict
    assert(Bench.calibBaseline(Seq(calLine(Seq(0.2, 0.21))),
      sf = Some("/tmp/sf")) === None)
    // pre-r15 entries (no load.chunk_load.calib_sec) contribute nothing
    assert(Bench.calibBaseline(Seq.fill(5)(histLine(idleRun)),
      sf = Some("/tmp/sf")) === None)
    // zero/absent probes are filtered, not counted as 0-second samples
    assert(Bench.calibBaseline(Seq(calLine(Seq(0.0, 0.0, 0.0))),
      sf = Some("/tmp/sf")) === None)
  }

  test("a permanently slower box escapes the calib-baseline lock-in") {
    // the probe twin of the all-suspect escape: a hardware-class slowdown
    // past 1.5x flags every chunk hot -> every run degraded -> degraded
    // entries never feed the baseline -> the stale fast-era reference
    // judges forever. Five consecutive contaminated probe-carrying entries
    // must BECOME the baseline instead.
    val fastEra = Seq.fill(3)(calLine(Seq(0.1, 0.1)))
    val slowRuns = Seq.fill(5)(calLine(Seq(0.2, 0.2), degraded = true))
    assert(Bench.calibBaseline(fastEra ++ slowRuns, sf = Some("/tmp/sf")) ===
      Some(0.2), "5 consecutive degraded probe entries are the new normal")
    // a TRANSIENT contamination cannot trip the escape: one clean entry
    // inside the recent window keeps the clean-era reference
    val transient = fastEra ++ Seq.fill(3)(calLine(Seq(0.9), suspect = true)) ++
      Seq(calLine(Seq(0.1))) ++ Seq(calLine(Seq(0.9), degraded = true))
    assert(Bench.calibBaseline(transient, sf = Some("/tmp/sf")) === Some(0.1))
    // pre-r15 entries with no probes are invisible to the escape count —
    // they can neither trip it nor block it
    val withLegacy = fastEra ++ Seq.fill(3)(histLine(idleRun)) ++ slowRuns
    assert(Bench.calibBaseline(withLegacy, sf = Some("/tmp/sf")) === Some(0.2))
  }

  test("calibVerdict judges the run median, tri-state") {
    assert(Bench.calibVerdict(Seq(0.2, 0.21, 0.22), Some(0.2)) === Some(false))
    assert(Bench.calibVerdict(Seq(0.5, 0.55, 0.6), Some(0.2)) === Some(true))
    // one hot chunk is the per-chunk flags' job — the run median holds
    assert(Bench.calibVerdict(Seq(0.2, 0.21, 0.9), Some(0.2)) === Some(false))
    assert(Bench.calibVerdict(Seq(0.5), None) === None, "no baseline -> unknown")
    assert(Bench.calibVerdict(Nil, Some(0.2)) === None, "no probes -> unknown")
  }

  test("the clean band is shared, windowed, and excludes self-stamped entries") {
    def line(v: Double, extra: String = "") =
      s"""{"metric":"total","value":$v,"degraded":false,"suspect":false$extra,""" +
        s""""queries":{"q_x":0.1},"sf":"/tmp/sf"}"""
    val totals = Bench.cleanBandTotals(Seq(line(97.2), line(105.9),
      line(276.3, extra = ""","env_inflated":true"""),
      line(150.0, extra = ""","calib_inflated":true"""),
      line(100.0)), sf = Some("/tmp/sf"))
    assert(totals === Seq(97.2, 105.9, 100.0),
      "env/calib-stamped entries must not stretch the band they anchor")
    assert(Bench.bandJson(totals) === "[97.2,105.9]")
    assert(Bench.bandJson(Nil) === "null")
    // the 10-entry window drops ancient outliers
    val many = (1 to 12).map(i => line(100.0 + i))
    assert(Bench.cleanBandTotals(many, sf = Some("/tmp/sf")).size === 10)
  }

  test("smoke baselines read reporting entries only") {
    val rep = (v: Double) =>
      s"""{"metric":"streaming_smoke","value":$v,"suites":7,"failed":0}"""
    val skip = """{"metric":"streaming_smoke","skipped":true,"reason":"timeout"}"""
    assert(Bench.smokeValueOf(rep(27.5)) === Some(27.5))
    assert(Bench.smokeValueOf(skip) === None,
      "a skip record must never read as a 0-second sample")
    assert(Bench.smokeValueOf("not json") === None)
    assert(Bench.smokeBaseline(Seq(rep(27.46), rep(26.4), skip, rep(29.0))) ===
      Some(27.46), "median of the last reporting values; skips don't count")
    assert(Bench.smokeBaseline(Seq(rep(27.0), rep(28.0))) === None,
      "below MinSamples -> no baseline")
    // the window keeps the LAST N reporting entries
    val drifted = Seq.fill(10)(rep(99.0)) ++ Seq.fill(5)(rep(27.0))
    assert(Bench.smokeBaseline(drifted) === Some(27.0))
  }

  test("envInflatedVerdict stamps the r14 capture true from the tail alone") {
    // THE r14 replay (VERDICT r14 next-step #2): smoke history 26-29 s,
    // this capture's smoke 105.16 s, no calib baseline yet (pre-r15
    // history carries no probes) — the artifact must stamp env_inflated
    // true even though every attribution sensor read idle
    val smokeHist = Seq(27.46, 26.4, 29.0).map(v =>
      s"""{"metric":"streaming_smoke","value":$v,"suites":7,"failed":0}""")
    val verdict = Bench.envInflatedVerdict(
      calib = Bench.calibVerdict(Nil, None),
      smokeSec = Bench.smokeValueOf(
        """{"metric":"streaming_smoke","value":105.16,"suites":7,"failed":0}"""),
      smokeBase = Bench.smokeBaseline(smokeHist))
    assert(verdict === Some(true),
      "the 3.8x fixed-workload smoke IS the contention evidence r14 lacked")
    // a clean capture with both sides judged reads explicit false
    assert(Bench.envInflatedVerdict(Some(false), Some(27.9),
      Bench.smokeBaseline(smokeHist)) === Some(false))
    // either side alone can stamp true
    assert(Bench.envInflatedVerdict(Some(true), None, None) === Some(true))
    // under the ratio or under the absolute floor: not inflated
    assert(Bench.envInflatedVerdict(None, Some(38.0),
      Bench.smokeBaseline(smokeHist)) === Some(false), "1.38x is under 1.5x")
    // no evidence at all: unknown, never a fake clean
    assert(Bench.envInflatedVerdict(None, None, None) === None)
    assert(Bench.envInflatedVerdict(None, Some(105.16), None) === None,
      "a smoke value with no baseline is not evidence")
  }

  test("a run-level tier-1 suspect stamp admits lone moderates to the retime set") {
    // ADVICE r14 #3: >=3 trivial tier-1 flags already adjudicate the
    // capture as contention — a lone 1.7-2.0x moderate in the same window
    // must get its retime without needing a moderate-only quorum
    val medians = Map("q_t1" -> 0.16, "q_t2" -> 0.15, "q_t3" -> 0.2,
      "q_heavy" -> 1.65)
    val (sus, runFlag) = Bench.suspectVerdict(Seq(
      "q_t1" -> 0.58, "q_t2" -> 0.62, "q_t3" -> 0.75, "q_heavy" -> 3.0),
      medians)
    assert(runFlag, "3 trivial tier-1 flags stamp the run")
    assert(sus.map(_._1).contains("q_heavy"),
      s"the 1.8x moderate must flag beside a confirmed-hot run: $sus")
    // without the run-level stamp the lone moderate still never flags
    val (lone, loneFlag) = Bench.suspectVerdict(Seq("q_heavy" -> 3.0), medians)
    assert(lone.isEmpty && !loneFlag)
    // and a confirmed-hot run with NO moderate readings adds nothing
    val (noMod, _) = Bench.suspectVerdict(Seq(
      "q_t1" -> 0.58, "q_t2" -> 0.62, "q_t3" -> 0.75, "q_heavy" -> 1.9),
      medians)
    assert(!noMod.map(_._1).contains("q_heavy"),
      "1.15x on the moderate key is not inflated; the stamp must not invent flags")
  }

  test("subset streaming records divert to the side file (ADVICE r14 #2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-subset")
    try {
      val official = """{"metric":"streaming_smoke","value":27.0,"failed":0}"""
      Bench.writeStreamingRecord(official, dir.toString)
      val sub = """{"metric":"streaming_smoke","value":3.0,"failed":0}"""
      Bench.writeStreamingRecord(sub, dir.toString, subset = true)
      assert(java.nio.file.Files.readString(dir.resolve("STREAMING_SUBSET.json"))
        .linesIterator.toSeq === Seq(sub))
      assert(java.nio.file.Files.readString(dir.resolve("STREAMING.json"))
        .linesIterator.toSeq === Seq(official),
        "a subset smoke must never overwrite the official snapshot")
      assert(java.nio.file.Files.readString(dir.resolve("STREAMING_HISTORY.jsonl"))
        .linesIterator.toSeq === Seq(official),
        "a subset smoke must never append to the official trail " +
          "(it would feed smokeBaseline and the round review)")
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }
  }

  test("HistoryReport applies the decision table to the latest entry") {
    def entry(extra: String) =
      s"""{"metric":"total","value":100.0,"unit":"sec","degraded":false,""" +
        s"""$extra"queries":{"q_x":0.1},"sf":"/tmp/sf"}"""
    def verdictOf(latest: String): String =
      graft.tools.HistoryReport.report(idleHistory :+ latest)
        .linesIterator.find(_.startsWith("latest adjudication:")).getOrElse("")
    assert(verdictOf(entry(""""suspect":false,"""))
      .contains("clean (nothing flagged)"))
    assert(verdictOf(entry(""""suspect":true,"retime_clean":true,"retime_hot":false,"""))
      .contains("flags ambient"))
    assert(verdictOf(entry(
      """"suspect":true,"retime_clean":false,"retime_hot":false,"env_inflated":true,"""))
      .contains("environmental -- fixed workloads confirm"))
    assert(verdictOf(entry(""""suspect":true,"retime_clean":false,"retime_hot":true,"""))
      .contains("environmental-leaning"))
    assert(verdictOf(entry(
      """"suspect":true,"retime_clean":false,"retime_hot":false,"env_inflated":false,"""))
      .contains("REAL-REGRESSION CANDIDATE"))
    assert(verdictOf(entry(""""suspect":true,"retime_clean":false,"retime_hot":false,"""))
      .contains("unadjudicable"))
    // a pre-r14 suspect entry carries no adjudication fields at all
    assert(verdictOf(entry(""""suspect":true,"""))
      .contains("pre-adjudication"))
    // an unflagged run whose fixed workloads still read inflated (possible:
    // thin per-query medians, rich probe/smoke baselines) must warn
    assert(verdictOf(entry(""""suspect":false,"env_inflated":true,"""))
      .contains("treat the total with caution"))
    // the trail column: run-median probe beside each entry that carries one
    val withCalib = entry(""""suspect":false,""").replace(""""queries"""",
      """"load":{"cores":32,"chunk_load":[{"calib_sec":0.11,"hot":false},""" +
        """{"calib_sec":0.13,"hot":false}]},"queries"""")
    assert(graft.tools.HistoryReport.report(idleHistory :+ withCalib)
      .contains("calib=0.13"),
      "upper-median of [0.11,0.13]; pre-r15 entries print no calib column")
  }

  // ---- internal deadline + degrade ladder + quick keys (VERDICT r15) ----

  test("the deadline and chunk-size knobs parse defensively") {
    // r15 died at the driver's wall cap with nothing emitted; the internal
    // budget must never itself be a new way to emit nothing — junk or
    // non-positive values fall back to the default, they never zero the run
    assert(Bench.benchDeadlineSec(None) === Bench.DefaultDeadlineSec)
    assert(Bench.benchDeadlineSec(Some("900")) === 900.0)
    assert(Bench.benchDeadlineSec(Some(" 450.5 ")) === 450.5)
    assert(Bench.benchDeadlineSec(Some("junk")) === Bench.DefaultDeadlineSec)
    assert(Bench.benchDeadlineSec(Some("0")) === Bench.DefaultDeadlineSec)
    assert(Bench.benchDeadlineSec(Some("-5")) === Bench.DefaultDeadlineSec)
    // non-finite values parse (toDoubleOption accepts "Infinity", and
    // "1e400" overflows to it) but would render as the bare token
    // `Infinity` in budgetFields — invalid JSON on the lines whose
    // parseability is the whole contract (ADVICE r16 #1)
    assert(Bench.benchDeadlineSec(Some("Infinity")) === Bench.DefaultDeadlineSec)
    assert(Bench.benchDeadlineSec(Some("1e400")) === Bench.DefaultDeadlineSec)
    assert(Bench.benchDeadlineSec(Some("NaN")) === Bench.DefaultDeadlineSec)
    // the chunk-size override is dev/e2e plumbing with the same discipline
    assert(Bench.chunkSizeFromEnv(None) === 29)
    assert(Bench.chunkSizeFromEnv(Some("2")) === 2)
    assert(Bench.chunkSizeFromEnv(Some("junk")) === 29)
    assert(Bench.chunkSizeFromEnv(Some("0")) === 29)
  }

  test("the degrade ladder trips on projected pace, never on chunk 0") {
    // 3 of 8 chunks took 300 s (100 s/chunk): 5 remaining project to 500 s
    assert(Bench.ladderNeeded(done = 3, total = 8, elapsedSec = 300, remainingSec = 400),
      "500 s projected into a 400 s budget must degrade")
    assert(!Bench.ladderNeeded(done = 3, total = 8, elapsedSec = 300, remainingSec = 600),
      "500 s projected into a 600 s budget fits — no degrade")
    // chunk 0 has no measured pace: the ladder can never pre-degrade a run
    assert(!Bench.ladderNeeded(done = 0, total = 8, elapsedSec = 0, remainingSec = 1))
    // nothing left to protect
    assert(!Bench.ladderNeeded(done = 8, total = 8, elapsedSec = 900, remainingSec = 0))
  }

  test("quick keys come from clean-history medians under the 1 s bar") {
    val medians = Map("q_cheap" -> 0.2, "q_edge" -> 0.99, "q_heavy" -> 1.5,
      "q_at_bar" -> 1.0)
    assert(Bench.quickKeys(
      Seq("q_cheap", "q_edge", "q_heavy", "q_at_bar", "q_new"), medians) ===
      Map("q_cheap" -> 0.2, "q_edge" -> 0.99),
      "sub-1 s medians are quick (median carried for the child's accept " +
        "test); >=1 s and history-less keys keep median-of-3")
    // a first run (no medians) times EVERYTHING at repeats=3
    assert(Bench.quickKeys(Seq("q_a", "q_b"), Map.empty) ===
      Map.empty[String, Double])
  }

  test("the adaptive-quick accept test and its argv round-trip (r17)") {
    // VERDICT r16 next-step #6: one reading publishes alone only when it
    // lands inside 1.3x median + 0.05 s of the key's own clean median — a
    // steal burst (the 18x q_asof_join shape) can never accept, so the
    // min-of-2 fallback keeps the r16 burst defense at ~half the cost
    assert(Bench.quickAccept(reading = 0.2, median = 0.2))
    assert(Bench.quickAccept(reading = 0.31, median = 0.2),
      "1.3x 0.2 + 0.05 = 0.31 — the band edge accepts (<=)")
    assert(!Bench.quickAccept(reading = 0.32, median = 0.2))
    assert(Bench.quickAccept(reading = 0.1, median = 0.05),
      "the absolute slack dominates tiny medians — warm jitter on a 50 ms " +
        "key must not force the second reading")
    assert(!Bench.quickAccept(reading = 3.6, median = 0.2),
      "a burst reading is rejected and falls back to min-of-2")
    // the quick set rides the chunk-fork argv as name=median pairs
    val quick = Map("q_a" -> 0.2, "q_b" -> 0.05)
    val csv = Bench.quickCsvOf(quick, Seq("q_a", "q_b", "q_c"))
    assert(Bench.parseQuickCsv(csv) === quick,
      "the child must reconstruct exactly the parent's quick medians")
    assert(Bench.parseQuickCsv("") === Map.empty[String, Double])
    assert(Bench.parseQuickCsv("junk,q_x=notanumber") ===
      Map.empty[String, Double], "junk entries drop, they never crash a chunk")
  }

  test("rotatedChunks moves the deadline-skip burden across runs (r17)") {
    // VERDICT r16 next-step #1: chunks ran in sorted order, so a deadline
    // trip always starved the SAME alphabetical tail (r16 skipped exactly
    // the 4 sorted-last keys; every contended run would re-skip them).
    val chunks = Seq(Seq("a", "b"), Seq("c", "d"), Seq("e", "f"))
    assert(Bench.rotatedChunks(chunks, 0) === chunks,
      "seed 0 (empty history) keeps the sorted order")
    assert(Bench.rotatedChunks(chunks, 1) ===
      Seq(Seq("c", "d"), Seq("e", "f"), Seq("a", "b")))
    assert(Bench.rotatedChunks(chunks, 3) === chunks, "rotation is mod size")
    assert(Bench.rotatedChunks(chunks, -1) ===
      Seq(Seq("e", "f"), Seq("a", "b"), Seq("c", "d")),
      "a negative seed still lands in range")
    // the adjudicated property: two consecutive deadline-hit runs (history
    // grows by one per completed run) skip DIFFERENT key sets when both
    // die after the same number of chunks
    def skippedAfter(seed: Int, chunksDone: Int): Set[String] =
      Bench.rotatedChunks(chunks, seed).drop(chunksDone).flatten.toSet
    assert(skippedAfter(seed = 5, chunksDone = 2) !==
      skippedAfter(seed = 6, chunksDone = 2),
      "consecutive contended runs must not starve the same tail")
    // within-chunk composition and order are untouched — warm-up
    // attribution stays comparable across runs
    assert(Bench.rotatedChunks(chunks, 2).flatten.toSet === chunks.flatten.toSet)
    assert(Bench.rotatedChunks(Seq(Seq("a")), 7) === Seq(Seq("a")))
    assert(Bench.rotatedChunks(Seq.empty[Seq[String]], 3) ===
      Seq.empty[Seq[String]])
  }

  test("the smoke reserve triggers mid-run inside [60 s, 180 s) (r17)") {
    // VERDICT r16 next-step #2: the smoke was the deadline's first
    // casualty (r16's STREAMING.json = "skipped: bench deadline"). It now
    // runs the moment the remaining budget first drops under the reserve —
    // before the last chunks spend it — and only a budget the ~45 s suite
    // cannot finish in (< 60 s) still yields the explicit skip record.
    assert(!Bench.smokeDueNow(1000.0), "a comfortable budget waits for the end")
    assert(Bench.smokeDueNow(179.9))
    assert(!Bench.smokeDueNow(180.0), "at the reserve is not yet inside it")
    assert(Bench.smokeDueNow(60.0), "the floor is inclusive")
    assert(!Bench.smokeDueNow(59.9),
      "under the floor the smoke cannot finish — deadline skip record instead")
    assert(!Bench.smokeDueNow(-5.0))
  }

  test("the smoke reserve is pace-predictive: a wide chunk cannot jump the window") {
    // The between-chunks check sees remaining=190 s (outside the static
    // window); a contended chunk then takes 250 s and the next check
    // wakes at remaining<60 s — smoke lost. The predictive trigger runs
    // it NOW when the measured pace projects the next chunk landing the
    // budget below the runnable floor.
    assert(Bench.smokeDueNow(190.0, projectedChunkSec = 250.0),
      "projected to jump clean over the window — last chance, due now")
    assert(!Bench.smokeDueNow(190.0, projectedChunkSec = 100.0),
      "projected to land INSIDE the window — the next check catches it")
    assert(!Bench.smokeDueNow(400.0, projectedChunkSec = 120.0),
      "comfortable budget, normal pace — waits for the end")
    assert(Bench.smokeDueNow(400.0, projectedChunkSec = 390.0),
      "even a comfortable budget is due when one chunk would spend it all")
    assert(!Bench.smokeDueNow(59.9, projectedChunkSec = 250.0),
      "already under the floor — unrunnable regardless of projection")
    assert(!Bench.smokeDueNow(1000.0),
      "no pace measured yet (projection 0) — static window only")
  }

  test("the parallel memory probe feeds isHot/loadFieldsJson beside the scalar probe (r17)") {
    // VERDICT r16 next-step #3: the r16 driver run was ~2x inflated while
    // the single-thread ALU probe read clean — it is structurally blind to
    // memory-bandwidth/LLC contention that hits 32-way execution. The
    // parallel probe is judged against ITS OWN baseline, same thresholds.
    val slowPar = idle.copy(calibParSec = 0.35)
    assert(!Bench.isHot(slowPar, cores), "no calibParRef -> never triggers")
    assert(Bench.isHot(slowPar, cores, calibParRef = Some(0.2)),
      "0.35 s parallel probe vs 0.2 s baseline is 1.75x — hot")
    assert(!Bench.isHot(idle.copy(calibParSec = 0.25), cores,
      calibParRef = Some(0.2)), "1.25x is inside the noise band")
    assert(!Bench.isHot(idle.copy(calibParSec = 0.11), cores,
      calibParRef = Some(0.08)),
      "a 30 ms delta is jitter even past the ratio — the absolute floor holds")
    assert(Bench.isHot(slowPar, cores, calibParRef = Some(0.2),
      includeNonRetryable = false), "the parallel-probe trigger is retryable")
    // an idle scalar probe never masks a hot parallel one (and vice versa)
    assert(Bench.isHot(idle.copy(calibSec = 0.1, calibParSec = 0.35), cores,
      calibRef = Some(0.1), calibParRef = Some(0.2)),
      "the r16 blind spot: ALU probe clean, bandwidth probe screaming")
    // the chunk json carries the probe and the run block its reference
    val (json, deg) = Bench.loadFieldsJson(
      Seq(idle.copy(calibSec = 0.21, calibParSec = 0.08)), cores, None, None,
      calibRef = Some(0.2), calibParRef = Some(0.08))
    assert(!deg)
    val n = mapper.readTree(json)
    assert(n.get("calib_par_ref").asDouble === 0.08)
    assert(n.get("chunk_load").get(0).get("calib_par_sec").asDouble === 0.08)
    val (hotJson, hotDeg) = Bench.loadFieldsJson(
      Seq(idle.copy(calibParSec = 0.5)), cores, None, None,
      calibParRef = Some(0.2))
    assert(hotDeg, "parallel-probe inflation degrades through the same plumbing")
    assert(mapper.readTree(hotJson).get("chunk_load").get(0).get("hot").asBoolean)
    // without a reference the field publishes (for the NEXT run's baseline)
    // but never judges — the sensor self-arms after one clean run
    val (noRef, noRefDeg) = Bench.loadFieldsJson(
      Seq(idle.copy(calibParSec = 0.5)), cores, None, None)
    assert(!noRefDeg && mapper.readTree(noRef).get("calib_par_ref") === null)
    assert(mapper.readTree(noRef).get("chunk_load").get(0)
      .get("calib_par_sec").asDouble === 0.5)
  }

  test("calibBaseline pools the parallel probe through the field selector (r17)") {
    def parLine(vals: Seq[Double], degraded: Boolean = false): String =
      s"""{"metric":"total","value":100.0,"degraded":$degraded,""" +
        s""""suspect":false,"queries":{"q_x":0.1},""" +
        s""""load":{"cores":32,"chunk_load":[""" +
        vals.map(v => s"""{"load":0.1,"calib_sec":0.2,"calib_par_sec":$v,"hot":false}""")
          .mkString(",") + s"""]},"sf":"/tmp/sf"}"""
    val hist = Seq(parLine(Seq(0.08, 0.09)), parLine(Seq(0.08, 0.1)))
    assert(Bench.calibBaseline(hist, sf = Some("/tmp/sf"),
      field = "calib_par_sec") === Some(0.09))
    // the scalar baseline from the same lines is untouched by the new field
    assert(Bench.calibBaseline(hist, sf = Some("/tmp/sf")) === Some(0.2))
    // pre-r17 entries (calib_sec only) carry nothing for the parallel
    // probe: its baseline stays None — null verdicts, never a guess
    val legacy = Seq(calLine(Seq(0.2, 0.21)), calLine(Seq(0.2, 0.22)))
    assert(Bench.calibBaseline(legacy, sf = Some("/tmp/sf"),
      field = "calib_par_sec") === None)
    assert(Bench.calibBaseline(legacy, sf = Some("/tmp/sf")) === Some(0.21))
  }

  test("a provisional closing line is stamped partial and parses as the same shape") {
    // VERDICT r15 next-step #2: after every chunk the bench prints the
    // cumulative record stamped partial:true — whatever instant the
    // process dies, the stdout tail holds a parseable best-available
    // record. Same metric name, same prefix, last-wins like every metric
    // line here; the stamp is what tells a reader adjudication is
    // incomplete.
    val line = Bench.closingTotalLine(total = 42.5, degraded = false,
      suspect = false, retimeClean = None, retimeHot = None,
      envInflated = None, band = "[97.2,107.1]", run = 40, failed = 0,
      sfDir = "/tmp/sf", streamingFields = Bench.streamingRegression(None, Nil),
      wallSec = 123.45, skipped = 0, partial = true)
    assert(line.startsWith("""{"metric":"total","value":"""),
      "the partial stamp must not disturb the pinned prefix")
    val n = mapper.readTree(line)
    assert(n.get("partial").asBoolean === true)
    assert(n.get("wall_sec").asDouble === 123.5)
    assert(n.get("value").asDouble === 42.5)
    assert(n.get("queries_run").asInt === 40)
    assert(n.get("retime_clean").isNull && n.get("env_inflated").isNull,
      "mid-run adjudication is unknown, never a fake verdict")
    assert(line.length < 700, s"provisional lines share the byte budget: ${line.length}")
    // a deadline-tripped final record carries the skip count (the skip
    // NAMES ride the full line's `skipped` array, not the compact tail)
    val clipped = Bench.closingTotalLine(total = 42.5, degraded = true,
      suspect = false, retimeClean = None, retimeHot = None,
      envInflated = None, band = "null", run = 40, failed = 0,
      sfDir = "/tmp/sf", streamingFields = Bench.streamingRegression(None, Nil),
      wallSec = 905.0, skipped = 104, repeats = 1)
    val c = mapper.readTree(clipped)
    assert(c.get("queries_skipped").asInt === 104)
    assert(c.get("repeats").asInt === 1, "a ladder-degraded run says so")
    assert(c.get("degraded").asBoolean === true,
      "a partial total must never read as baseline material")
  }

  test("cleanBandTotals matches sf exactly, including absence (ADVICE r15 #3)") {
    def line(v: Double, sfField: String) =
      s"""{"metric":"total","value":$v,"degraded":false,"suspect":false,""" +
        s""""queries":{"q_x":0.1}$sfField}"""
    val mixed = Seq(
      line(100.0, ""","sf":"/tmp/sf""""),
      line(50.0, ""","sf":"/other/sf""""),
      line(77.0, "")) // pre-stamp entry, no sf field at all
    assert(Bench.cleanBandTotals(mixed, sf = Some("/tmp/sf")) === Seq(100.0),
      "a stamped want excludes other-sf AND unstamped entries")
    assert(Bench.cleanBandTotals(mixed, sf = None) === Seq(77.0),
      "an sf-less caller (pre-stamp latest entry) must pool ONLY sf-less " +
        "entries — the old forall pooled all scales into one band")
  }

  test("cleanTrend adjudicates clean-total creep (VERDICT r15 next-step #4)") {
    // the r15 shape: five clean ~103 s captures, then three at ~119 s —
    // every one inside the widening min-max band, so nothing flagged; the
    // trend must call the drift by name
    val creeping = Seq(101.0, 103.0, 105.0, 102.0, 104.0, 118.0, 119.4, 121.0)
    val Some((recent, prior, creep)) = Bench.cleanTrend(creeping)
    assert(recent === 119.4 && prior === 103.0)
    assert(creep, "1.16x and +16 s past the prior median IS a creep")
    // flat history is stable
    val Some((_, _, flat)) = Bench.cleanTrend(Seq.fill(8)(103.0) :+ 104.0)
    assert(!flat)
    // small absolute drift never flags even past the ratio (tiny totals)
    val Some((_, _, tiny)) = Bench.cleanTrend(Seq.fill(5)(1.0) ++ Seq(2.0, 2.0, 2.0))
    assert(!tiny, "a 1 s delta is under the absolute floor")
    // thin history has no trend, only noise
    assert(Bench.cleanTrend(Seq(100.0, 119.0, 120.0, 121.0, 99.0)) === None)
    assert(Bench.cleanTrend(Nil) === None)
    // a recovery (recent BELOW prior) is stable, not creep
    val Some((_, _, rec)) = Bench.cleanTrend(
      Seq(119.0, 120.0, 121.0, 119.0, 120.0, 103.0, 102.0, 104.0))
    assert(!rec)
  }

  test("HistoryReport prints the clean trend beside the band") {
    def line(v: Double) =
      s"""{"metric":"total","value":$v,"unit":"sec","degraded":false,""" +
        s""""suspect":false,"queries":{"q_x":0.1},"sf":"/tmp/sf"}"""
    val creeping = Seq(101.0, 103.0, 105.0, 102.0, 104.0, 118.0, 119.4, 121.0)
    val rep = graft.tools.HistoryReport.report(creeping.map(line))
    assert(rep.contains("clean trend: last-3 median 119.4 s vs prior median 103.0 s"),
      s"the trend row must read off the header: $rep")
    assert(rep.contains("CREEPING"), rep)
    val stable = graft.tools.HistoryReport.report(
      (Seq.fill(8)(103.0) :+ 103.5).map(line))
    assert(stable.contains("-- stable"), stable)
    // a thin trail prints no trend row at all — never a fake verdict
    assert(!graft.tools.HistoryReport.report(Seq(line(100.0))).contains("clean trend"))
  }

  test("HistoryReport qualifies a regression verdict with per-query burst-steal evidence") {
    // the r16 contended capture's shape: retimes not clean (cap-dropped or
    // re-hit by the next burst), env sensors at speed (bursts land between
    // the ~0.1 s probes) — the tri-states alone read REAL-REGRESSION, but
    // the flagged rows' own steal windows carry the environmental evidence
    def entry(steal: String) =
      s"""{"metric":"total","value":155.0,"unit":"sec","degraded":true,""" +
        s""""suspect":true,"retime_clean":false,"retime_hot":false,""" +
        s""""env_inflated":false,""" +
        s""""suspect_queries":["q_a","q_b","q_c","q_d"],$steal""" +
        s""""queries":{"q_x":0.1},"sf":"/tmp/sf"}"""
    val withSteal = entry(
      """"query_steal":{"q_a":13.3,"q_b":8.3,"q_c":4.1,"q_d":0.4},""")
    val rep = graft.tools.HistoryReport.report(idleHistory :+ withSteal)
    assert(rep.contains("REAL-REGRESSION CANDIDATE"), rep)
    assert(rep.contains("BUT 3 of 4 flagged rows carry >=3% steal"),
      s"material steal on >=3 flagged rows must qualify the verdict: $rep")
    // without the steal evidence the plain verdict stands unqualified
    val noSteal = graft.tools.HistoryReport.report(idleHistory :+ entry(""))
    assert(noSteal.contains("REAL-REGRESSION CANDIDATE") && !noSteal.contains("BUT"),
      s"no steal evidence -> no qualifier: $noSteal")
    // sub-quorum steal (2 of 4 rows) stays unqualified — two noisy windows
    // among four flagged are not yet the burst signature
    val two = graft.tools.HistoryReport.report(idleHistory :+ entry(
      """"query_steal":{"q_a":13.3,"q_b":8.3},"""))
    assert(!two.contains("BUT"), two)
    // ...but ALL flagged rows steal-hit is the same evidence at small n:
    // the r16 clean capture's lone 2.1x flag read 4.1% steal in its only
    // window — 1 of 1 must qualify
    def lone(steal: String) =
      s"""{"metric":"total","value":99.6,"unit":"sec","degraded":false,""" +
        s""""suspect":false,"retime_clean":false,"retime_hot":false,""" +
        s""""env_inflated":false,"suspect_queries":["q_a"],$steal""" +
        s""""queries":{"q_x":0.1},"sf":"/tmp/sf"}"""
    val loneHit = graft.tools.HistoryReport.report(
      idleHistory :+ lone(""""query_steal":{"q_a":4.1},"""))
    assert(loneHit.contains("BUT 1 of 1 flagged rows"), loneHit)
    // a lone flag with a QUIET window keeps the unqualified verdict — that
    // one really is as likely a regression
    val loneQuiet = graft.tools.HistoryReport.report(idleHistory :+ lone(""))
    assert(loneQuiet.contains("REAL-REGRESSION CANDIDATE") &&
      !loneQuiet.contains("BUT"), loneQuiet)
  }

  test("HistoryReport surfaces wall_sec and deadline skip counts on the trail") {
    def entry(extra: String) =
      s"""{"metric":"total","value":96.8,"unit":"sec",""" +
        s""""suspect":false,$extra"queries":{"q_x":0.1},"sf":"/tmp/sf"}"""
    val rep = graft.tools.HistoryReport.report(idleHistory :+ entry(
      """"degraded":false,"wall_sec":683.1,"queries_skipped":0,"""))
    assert(rep.contains("wall=683s"), s"the wall column must read off the trail: $rep")
    assert(!rep.contains("SKIPPED"), "zero skips stay silent")
    val clipped = graft.tools.HistoryReport.report(idleHistory :+ entry(
      """"degraded":true,"wall_sec":905.0,"queries_skipped":104,"""))
    assert(clipped.contains("SKIPPED=104"),
      s"a deadline-clipped entry's small total must not read as a speedup: $clipped")
    // pre-r16 entries carry neither field and print neither column
    assert(!graft.tools.HistoryReport.report(idleHistory).contains("wall="))
  }

  test("HistoryReport names chunk-level degradation in the decision table (ADVICE r15 #2)") {
    // degraded:true with nothing query-level flagged used to print
    // "clean (nothing flagged)", contradicting the trail row above it
    def entry(extra: String) =
      s"""{"metric":"total","value":100.0,"unit":"sec",$extra""" +
        s""""queries":{"q_x":0.1},"sf":"/tmp/sf"}"""
    val rep = graft.tools.HistoryReport.report(
      idleHistory :+ entry(""""degraded":true,"suspect":false,"""))
    assert(rep.contains("latest adjudication: chunk-level contention flagged (degraded)"),
      s"a degraded-only entry must not read clean: $rep")
    // an undegraded, unflagged entry still reads clean
    assert(graft.tools.HistoryReport.report(
      idleHistory :+ entry(""""degraded":false,"suspect":false,"""))
      .contains("clean (nothing flagged)"))
    // suspect still outranks the degraded arm (pre-adjudication reading)
    assert(graft.tools.HistoryReport.report(
      idleHistory :+ entry(""""degraded":true,"suspect":true,"""))
      .contains("pre-adjudication"))
  }

  test("the emitted degraded flag rides a parseable full line") {
    // assemble a line the way main does (same field layout) and check a
    // JSON consumer reads metric/degraded/load back — guards the string
    // plumbing around loadFieldsJson, where a misplaced quote would turn
    // the whole artifact line unreadable
    val (loadJson, degraded) =
      Bench.loadFieldsJson(Seq(idle.copy(stealPct = 4.0)), cores, None, None)
    val line =
      s"""{"metric":"total","value":12.5,"unit":"sec","repeats":3,""" +
        s""""degraded":$degraded,"chunks":1,"chunks_forked":1,"chunk_size":20,""" +
        s""""chunks_retried":1,"queries":{"q_x":12.5},"errors":{},""" +
        s""""load":$loadJson,"sf":"/tmp/sf"}"""
    val node = mapper.readTree(line)
    assert(node.get("degraded").asBoolean === true)
    assert(node.get("load").get("chunk_load").get(0).get("steal_pct").asDouble === 4.0)
    assert(node.get("metric").asText === "total")
  }
}
