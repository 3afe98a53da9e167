package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Seeded corruption fuzz over the binary decoders (VERDICT r10 next-step
  * #3): the r10 hardening of `pngDecode` (Long-widened chunk bounds, the
  * 64 MiB decoded-size cap, the zero-progress inflate guard) was pinned
  * only by the specific fixtures that motivated it. This spec pins the
  * CLASS of failure: for each format, a deterministic LCG drives hundreds
  * of mutations of a valid payload — truncations, random byte/bit damage,
  * length-field overwrites (the chunk-walk attack surface), garbage
  * appends — and every decoder must (a) never throw, (b) finish in bounded
  * wall time (no inflate/marker-walk spin), and (c) answer damage with
  * `None` / `*_ok = 0` + null fields, never garbage dressed as success.
  *
  * Deterministic by construction (fixed seed, no time/entropy), so a
  * failure is replayable by index: the assertion message carries the
  * mutation number.
  */
class DecoderFuzzSpec extends SparkTestBase {
  import spark.implicits._

  /** Fixed-seed LCG (Knuth MMIX constants) — the only randomness source. */
  private final class Lcg(seed: Long) {
    private var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    /** Uniform in [0, n). */
    def nextInt(n: Int): Int = (((next() >>> 33) % n).toInt + n) % n
  }

  /** One seeded mutation of a valid payload. The kinds target the decoder
    * attack surfaces: truncation (mid-chunk/mid-stream), point damage
    * (CRC/filter/marker bytes), 4-byte big-endian length-field overwrites
    * with near-Int.MaxValue values (the Long-widening regression), LE
    * overwrites (RIFF/BMP size fields), and tail garbage.
    */
  private def mutate(valid: Array[Byte], rng: Lcg): Array[Byte] =
    rng.nextInt(5) match {
      case 0 => // truncate anywhere, including inside the first header
        valid.take(rng.nextInt(valid.length))
      case 1 => // 1-4 random byte overwrites
        val m = valid.clone()
        (0 until 1 + rng.nextInt(4)).foreach { _ =>
          m(rng.nextInt(m.length)) = rng.next().toByte
        }
        m
      case 2 => // big-endian u32 overwrite with a huge value at a random
        // 4-byte-aligned-ish offset — the crafted-chunk-length shape
        val m = valid.clone()
        if (m.length >= 12) {
          val off = rng.nextInt(m.length - 4)
          val v = 0x7FFFFF00 | rng.nextInt(256)
          m(off) = (v >>> 24).toByte; m(off + 1) = (v >>> 16).toByte
          m(off + 2) = (v >>> 8).toByte; m(off + 3) = v.toByte
        }
        m
      case 3 => // single bit flip
        val m = valid.clone()
        val off = rng.nextInt(m.length)
        m(off) = (m(off) ^ (1 << rng.nextInt(8))).toByte
        m
      case _ => // append garbage (trailing-junk tolerance must not loop)
        valid ++ Array.fill(1 + rng.nextInt(64))(rng.next().toByte)
    }

  /** Assert the whole fuzz batch finishes inside a generous wall budget —
    * the "never loops" clause. Idle-box runtime is well under a second per
    * batch; 120 s only trips on a genuine spin (the pre-r10 zero-progress
    * inflate state span forever).
    */
  private def bounded[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120.0, s"$label took ${secs}s — a decoder is spinning")
    r
  }

  // ---- pngDecode: direct JVM-side fuzz (the hardened decoder) -----------

  test("pngDecode survives 1000 seeded mutations: no throw, no spin, no garbage") {
    val px = Array.tabulate(8 * 8 * 4)(i => ((i * 37 + 11) % 251).toByte)
    val valid = Multimodal.pngBytes(8, 8, 4, px, Seq(0, 1, 2, 3, 4))
    // sanity: the fuzz base decodes before any mutation
    val base = Multimodal.pngDecode(valid)
    assert(base.exists(d => d.w == 8 && d.h == 8 && d.pixels.sameElements(px)))
    val rng = new Lcg(0xD1CEB00L)
    val inflater = new java.util.zip.Inflater() // reused, as extractFeatures does
    var decoded = 0
    bounded("pngDecode fuzz") {
      (0 until 1000).foreach { i =>
        val m = mutate(valid, rng)
        // the contract: total function — None on damage, a structurally
        // consistent image otherwise, never an exception or a hang
        val r = try Multimodal.pngDecode(m, inflater)
        catch { case e: Throwable =>
          fail(s"mutation $i threw ${e.getClass.getName}: ${e.getMessage}")
        }
        r.foreach { img =>
          decoded += 1
          assert(img.w > 0 && img.h > 0 && (img.channels == 3 || img.channels == 4),
            s"mutation $i decoded inconsistent geometry $img")
          assert(img.pixels.length == img.w * img.h * img.channels,
            s"mutation $i decoded pixels/geometry mismatch")
        }
      }
    }
    // CRC-verified chunks make accidental survival rare; tail-append (kind
    // 4) keeps the stream intact by design, so SOME mutations must decode —
    // a fuzzer whose base never survives is fuzzing a broken fixture
    assert(decoded > 0, "no mutation decoded — the fuzz base looks broken")
  }

  /** Recompute every chunk CRC after a structural mutation, so the damage
    * travels PAST the integrity check into the decoder's core — without
    * this, random mutations die at the first CRC mismatch and the inflate
    * loop, the filter reconstruction, and the geometry-vs-stream checks
    * are never reached. Tail damage that breaks the chunk walk itself is
    * left as-is (that path is the plain fuzzer's).
    */
  private def repairCrcs(p: Array[Byte]): Array[Byte] = {
    val m = p.clone()
    var pos = 8
    var ok = true
    while (ok && pos + 12 <= m.length) {
      val len = ((m(pos) & 0xFF) << 24) | ((m(pos + 1) & 0xFF) << 16) |
        ((m(pos + 2) & 0xFF) << 8) | (m(pos + 3) & 0xFF)
      if (len < 0 || pos.toLong + 12L + len > m.length) ok = false
      else {
        val crc = new java.util.zip.CRC32()
        crc.update(m, pos + 4, 4 + len)
        val v = crc.getValue.toInt
        m(pos + 8 + len) = (v >>> 24).toByte; m(pos + 9 + len) = (v >>> 16).toByte
        m(pos + 10 + len) = (v >>> 8).toByte; m(pos + 11 + len) = v.toByte
        pos += 12 + len
      }
    }
    m
  }

  test("pngDecode stays total when corruption is CRC-laundered into the core") {
    val px = Array.tabulate(8 * 8 * 3)(i => ((i * 29 + 5) % 251).toByte)
    val valid = Multimodal.pngBytes(8, 8, 3, px, Seq(0, 1, 2, 3, 4))
    val rng = new Lcg(0x5EED5EEDL)
    val inflater = new java.util.zip.Inflater()
    var decoded, rejected = 0
    bounded("pngDecode CRC-laundered fuzz") {
      (0 until 1000).foreach { i =>
        // mutate INSIDE the chunk stream (skip the 8-byte signature so the
        // walk always starts), then re-sign every chunk: IHDR dimension /
        // depth / color lies, IDAT zlib garbage, filter-byte damage — all
        // arrive at the inflate + reconstruction code with valid CRCs
        val m = valid.clone()
        (0 until 1 + rng.nextInt(6)).foreach { _ =>
          val off = 8 + rng.nextInt(m.length - 8)
          m(off) = (m(off) ^ (1 + rng.nextInt(255))).toByte
        }
        val laundered = repairCrcs(m)
        val r = try Multimodal.pngDecode(laundered, inflater)
        catch { case e: Throwable =>
          fail(s"laundered mutation $i threw ${e.getClass.getName}: ${e.getMessage}")
        }
        r match {
          case Some(img) =>
            decoded += 1
            assert(img.w > 0 && img.h > 0 &&
              img.pixels.length == img.w * img.h * img.channels,
              s"laundered mutation $i decoded inconsistent geometry")
            // the decode cap must hold even for header lies that pass
            assert(img.h.toLong * (1L + img.w.toLong * img.channels) <=
              Multimodal.MaxDecodedBytes, s"laundered mutation $i broke the size cap")
          case None => rejected += 1
        }
      }
    }
    // both branches must be genuinely exercised: CRC laundering lets some
    // mutations through to a successful (filter-scrambled but consistent)
    // decode, while geometry/stream lies still reject
    assert(decoded > 0, "no laundered mutation decoded — laundering is broken")
    assert(rejected > 0, "every laundered mutation decoded — damage isn't reaching the core")
  }

  /** Evaluate `parse` over mutated payloads through the real columnar
    * path (one binary-column DataFrame, collect) and hand each result row
    * to `check(mutationIndex, row)`.
    */
  private def fuzzColumn(valid: Array[Byte], n: Int, seed: Long,
      parse: org.apache.spark.sql.Column => org.apache.spark.sql.Column)(
      check: (Int, Row) => Unit): Unit = {
    val rng = new Lcg(seed)
    val payloads = (0 until n).map(i => (i, mutate(valid, rng)))
    val rows = payloads.toDF("i", "payload")
      .select(col("i"), parse(col("payload")).as("d"))
      .collect()
    rows.foreach(r => check(r.getInt(0), r.getStruct(1)))
  }

  /** Materialize a synth-hex Column expression into payload bytes. */
  private def synthBytes(hx: org.apache.spark.sql.Column): Array[Byte] =
    spark.range(1).select(unhex(hx)).head().getAs[Array[Byte]](0)

  // ---- the codegen'd header parsers: ok=0 + null fields on damage --------

  test("imageDims survives seeded PNG and multi-segment JPEG mutations") {
    val png  = synthBytes(Multimodal.synthPngHex(lit(123), lit(45)))
    val jpeg = synthBytes(Multimodal.synthJpegMultiHex(lit(1024), lit(768), lit(3), lit(18)))
    for ((valid, tag) <- Seq((png, "png"), (jpeg, "jpeg")))
      bounded(s"imageDims fuzz $tag") {
        fuzzColumn(valid, 500, 0xBEEF00L + tag.length, Multimodal.imageDims) { (i, d) =>
          // fmt is magic-sniffed, marker_ok gates the dims: whenever the
          // walk rejects, BOTH dims must be null (no half-parsed garbage)
          val ok = d.getAs[Long]("marker_ok")
          assert(ok == 0L || ok == 1L, s"$tag mutation $i: marker_ok=$ok")
          if (ok == 0L)
            assert(d.isNullAt(d.fieldIndex("width")) && d.isNullAt(d.fieldIndex("height")),
              s"$tag mutation $i: rejected payload leaked dims $d")
        }
      }
  }

  test("bmpGifDims survives seeded BMP and GIF mutations") {
    val bmp = synthBytes(Multimodal.synthBmpHex(lit(640), lit(480), lit(1)))
    val gif = synthBytes(Multimodal.synthGifHex(lit(320), lit(200), lit(1)))
    for ((valid, tag) <- Seq((bmp, "bmp"), (gif, "gif")))
      bounded(s"bmpGifDims fuzz $tag") {
        fuzzColumn(valid, 500, 0xCAFE00L + tag.length, Multimodal.bmpGifDims) { (i, d) =>
          val ok = d.getAs[Long]("hdr_ok")
          assert(ok == 0L || ok == 1L)
          if (ok == 0L)
            assert(d.isNullAt(d.fieldIndex("width")) && d.isNullAt(d.fieldIndex("height")) &&
              d.isNullAt(d.fieldIndex("topdown")),
              s"$tag mutation $i: rejected payload leaked fields $d")
        }
      }
  }

  test("the BMP pixel walks survive mutations AND declared-dimension bombs") {
    // the payload-controlled loop bounds are the attack surface here: a
    // mutated header declaring huge w/h must answer null FAST (guard short-
    // circuits before any product/sequence), not allocate a giant sequence
    // or throw on the ANSI cast of a hostile dataOff
    val thumb = synthBytes(Multimodal.synthBmp24Hex(lit(7), 8, 8))
    val small = synthBytes(Multimodal.synthBmp24Hex(lit(7), 3, 3))
    // sanity: unmutated payloads decode non-null
    val sane = Seq((0, thumb)).toDF("i", "payload").select(
      Multimodal.bmpDHash(col("payload")).as("dh"),
      Multimodal.bmpPixelStats(col("payload")).as("ps")).head()
    assert(!sane.isNullAt(0), "valid 8x8 thumbnail must hash")
    assert(sane.getStruct(1).getAs[Long]("sum_b") > 0L)
    // hand-crafted bombs: valid magic/DIB/bpp, dimensions at the hostile
    // extremes (u32 max → ANSI-overflow bait; 65535² → sequence bomb)
    def bomb(whex: String, hhex: String): Array[Byte] = {
      val m = small.clone()
      def putLe(off: Int, hx: String): Unit = (0 until 4).foreach { i =>
        m(off + i) = Integer.parseInt(hx.substring(i * 2, i * 2 + 2), 16).toByte
      }
      putLe(18, whex); putLe(22, hhex) // 0-based w@18, h@22
      m
    }
    val bombs = Seq(
      bomb("FFFFFFFF", "FFFFFFFF"), // u32 max both
      bomb("FFFF0000", "FFFF0000"), // 65535x65535: past MaxBmpPixels
      bomb("00000080", "01000000"), // w = 2^31: Int-cast bait
      bomb("40000000", "40000000")) // 64x64: sane dims, but body too short
    bounded("bmp bombs") {
      val rows = bombs.zipWithIndex.map(_.swap).toDF("i", "payload").select(
        col("i"), Multimodal.bmpDHash(col("payload")).as("dh"),
        Multimodal.bmpPixelStats(col("payload")).as("ps")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(1), s"bomb ${r.getInt(0)} produced a dHash")
        val ps = r.getStruct(2)
        Seq("sum_b", "sum_g", "sum_r", "p0_b").foreach(f =>
          assert(ps.isNullAt(ps.fieldIndex(f)),
            s"bomb ${r.getInt(0)} leaked pixel stats: $ps"))
      }
    }
    // seeded mutations over both functions (≥500 per operator — VERDICT
    // r11 next-step #5; every row evaluates BOTH walks)
    val rng = new Lcg(0xB0B0B0L)
    bounded("bmp pixel-walk fuzz") {
      val rows = (0 until 600).map(i => (i, mutate(if (i % 2 == 0) thumb else small, rng)))
        .toDF("i", "payload").select(col("i"),
          Multimodal.bmpDHash(col("payload")).as("dh"),
          Multimodal.bmpPixelStats(col("payload")).as("ps")).collect()
      rows.foreach { r =>
        if (!r.isNullAt(1)) {
          val dh = r.getLong(1)
          assert(dh >= 0L, s"mutation ${r.getInt(0)}: dHash left the 62-bit domain")
        }
        val ps = r.getStruct(2)
        // sums, when present, are bounded by the guard's own geometry cap
        if (!ps.isNullAt(ps.fieldIndex("sum_b"))) {
          val n = ps.getAs[Long]("w") * ps.getAs[Long]("h")
          assert(n >= 1L && n <= Multimodal.MaxBmpPixels)
          assert(ps.getAs[Long]("sum_b") <= n * 255L,
            s"mutation ${r.getInt(0)}: channel sum exceeds geometry bound")
        }
      }
    }
  }

  test("wavMeta and pcmFrames survive seeded WAV mutations") {
    val wav = synthBytes(Multimodal.synthWavHex(lit(2), lit(44100), lit(16)))
    bounded("wavMeta fuzz") {
      fuzzColumn(wav, 500, 0xF00DL, Multimodal.wavMeta) { (i, d) =>
        val ok = d.getAs[Long]("riff_ok")
        assert(ok == 0L || ok == 1L)
        if (ok == 0L)
          Seq("channels", "sample_rate", "byte_rate", "bits").foreach(f =>
            assert(d.isNullAt(d.fieldIndex(f)),
              s"mutation $i: rejected payload leaked $f: $d"))
      }
    }
    // pcmFrames reads a FIXED frames×perFrame prefix (substr past the end
    // yields empty hex → conv gives 0, by design: short payloads read as
    // silence, never as an error) — the fuzz property is total evaluation
    // with exact geometry, whatever the damage
    val pcm = synthBytes(Multimodal.synthPcm16Hex(lit(7), 64))
    val rng = new Lcg(0xA11D10L)
    bounded("pcmFrames fuzz") {
      // (pcmSilence gets its own ≥500-mutation test below — it carries the
      // run-length ENCODING state the per-frame fold does not)
      val rows = (0 until 300).map(i => (i, mutate(pcm, rng))).toDF("i", "payload")
        .select(col("i"), Multimodal.pcmFrames(col("payload"), 4, 16).as("fr"))
        .collect()
      rows.foreach { r =>
        val frames = r.getSeq[Row](1)
        assert(frames.length == 4, s"mutation ${r.getInt(0)}: frame count drifted")
        frames.zipWithIndex.foreach { case (f, k) =>
          assert(f.getAs[Long]("frame") == k.toLong)
          val (energy, peak) = (f.getAs[Long]("energy"), f.getAs[Long]("peak"))
          // 16 samples of |s| ≤ 32768 ⇒ exact bounds, damage or not
          assert(energy >= 0L && energy <= 16L * 32768 && peak >= 0L && peak <= 32768L,
            s"mutation ${r.getInt(0)} frame $k: out-of-domain energy/peak $f")
        }
      }
    }
  }

  test("pcmSilence survives seeded PCM mutations with coherent run-length state") {
    // pcmSilence is the third payload-geometry walker (VERDICT r11
    // next-step #5): unlike pcmFrames' independent per-frame folds it
    // carries cross-sample state — the cur·1000+best run encoding — so the
    // fuzz property is not just total evaluation but INTERNAL COHERENCE of
    // the decoded (n_silent, max_run) pair under arbitrary damage: a
    // scrambled sample can only flip silent/loud verdicts, never push the
    // encoding out of its domain. Short payloads read as silence by design
    // (substr past the end → empty hex → conv 0), so truncations are the
    // all-silent edge, not an error.
    val nSamples = 64
    val pcm = synthBytes(Multimodal.synthPcm16Hex(lit(11), nSamples))
    // sanity: the unmutated synth payload has both silent and loud samples
    // under this threshold, so both fold branches are exercised from row 0
    val sane = Seq((0, pcm)).toDF("i", "payload")
      .select(Multimodal.pcmSilence(col("payload"), nSamples, 100L).as("sl")).head().getStruct(0)
    assert(sane.getAs[Long]("n_silent") > 0L && sane.getAs[Long]("n_silent") < nSamples.toLong,
      s"fuzz base must mix silent and loud samples: $sane")
    val rng = new Lcg(0x511E9CEL)
    bounded("pcmSilence fuzz") {
      val rows = (0 until 500).map(i => (i, mutate(pcm, rng))).toDF("i", "payload")
        .select(col("i"), Multimodal.pcmSilence(col("payload"), nSamples, 100L).as("sl"))
        .collect()
      rows.foreach { r =>
        val sl = r.getStruct(1)
        val (nSil, maxRun) = (sl.getAs[Long]("n_silent"), sl.getAs[Long]("max_run"))
        val i = r.getInt(0)
        assert(nSil >= 0L && nSil <= nSamples.toLong,
          s"mutation $i: n_silent=$nSil left [0, $nSamples]")
        assert(maxRun >= 0L && maxRun <= nSil,
          s"mutation $i: max_run=$maxRun exceeds n_silent=$nSil — the run encoding broke")
        assert((nSil == 0L) == (maxRun == 0L),
          s"mutation $i: any silent sample is a run of >= 1 ($sl)")
      }
    }
  }
}
