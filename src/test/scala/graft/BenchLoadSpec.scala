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
