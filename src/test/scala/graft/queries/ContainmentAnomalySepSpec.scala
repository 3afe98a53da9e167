package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.{SparkEntry, SparkTestBase, Tables}

/** Brute-force behavior pins for the round-8 additions — each graded query
  * recomputed from first principles over the collected sf0.001 corpus
  * (test-only collect: ~50 docs / ~100 events / ~50 vectors), independent of
  * both the Spark plan and the DuckDB oracle, so a shared-wrong-assumption
  * bug between the two graded twins still gets caught here.
  */
class ContainmentAnomalySepSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  /** Spark round(x, 4) / round(x) are HALF_UP on double — mirror exactly. */
  private def r4(x: Double): Double =
    new JBigDecimal(x).setScale(4, RoundingMode.HALF_UP).doubleValue

  test("q_containment_pairs matches the brute-force capped-gram containment") {
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", "coalesce(text, '') as text")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // 2-gram sets per doc (distinct), mirroring Dialect.wordsSql/duckGramsSql
    val grams0 = docs.map { case (id, src, text) =>
      val words = text.trim.split(" +", -1)
      val gs =
        if (words.length < 2) Set.empty[String]
        else words.sliding(2).map(_.mkString(" ")).toSet
      (id, src, gs)
    }
    // stop-gram cap: df within source <= 50
    val df = grams0.flatMap { case (id, src, gs) => gs.map(g => (src, g) -> id) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.size }
    val grams = grams0.map { case (id, src, gs) =>
      (id, src, gs.filter(g => df((src, g)) <= 50))
    }
    val want = (for {
      (a, sa, ga) <- grams
      (b, sb, gb) <- grams
      if sa == sb && a < b
      inter = (ga intersect gb).size
      if inter > 0
      cont = r4(inter.toDouble / math.min(ga.size, gb.size))
      if cont >= 0.3
    } yield (a, b, cont, r4(inter.toDouble / (ga.size + gb.size - inter))))
      .sortBy(p => (p._1, p._2))
    val got = run("q_containment_pairs").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got == want)
    // the corpus must actually exercise the threshold (some pair found) and
    // the asymmetry cont > jac must hold strictly somewhere (inclusion case)
    assert(want.nonEmpty && want.exists(p => p._3 > p._4))
  }

  test("q_zscore_anomaly matches the brute-force z² grid computation") {
    val ev = Tables.events(spark, dir)
      .selectExpr("event_type", "unix_micros(ts) as us")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1) / 3600000000L))
    val counts = ev.groupBy(identity).map { case ((t, h), xs) => (t, h) -> xs.size.toLong }
    val hours  = ev.map(_._2).distinct.sorted
    val types  = ev.map(_._1).distinct.sorted
    val want = (for {
      t <- types
      xs = hours.map(h => h -> counts.getOrElse((t, h), 0L))
      n  = xs.size.toLong
      s  = xs.map(_._2).sum
      ss = xs.map(x => x._2 * x._2).sum
      varn = n * ss - s * s
      if varn > 0
      (h, x) <- xs
      dev = x * n - s
      if dev * dev >= 4 * varn
    } yield (t, h, x, dev * dev * 10000 / varn, java.lang.Long.signum(dev).toLong))
      .sortBy(p => (p._1, p._2))
    val got = run("q_zscore_anomaly").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got == want)
    // the threshold must actually fire (sf0.001 carries spike anomalies;
    // drop-direction rows appear only at larger factors)
    assert(want.exists(_._5 == 1L))
  }

  test("q_cluster_sep matches the brute-force centroid separation audit") {
    val vecs = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", "embedding")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toSeq))
      .filter(_._3.size == 64)
      .map { case (id, l, e) =>
        (id, l, e.map(x =>
          new JBigDecimal(x.toDouble * 1000).setScale(0, RoundingMode.HALF_UP).longValue))
      }
    // exact floor-mean centroids, the q_label_centroids construction
    val cents: Map[Int, Seq[Long]] = vecs.groupBy(_._2).map { case (l, xs) =>
      l -> (0 until 64).map { p =>
        val vs = xs.map(_._3(p))
        vs.map(_ + 1000L).sum / vs.size - 1000L
      }
    }
    def d2(q: Seq[Long], c: Seq[Long]): Long =
      q.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    val perVec = vecs.map { case (_, l, q) =>
      val a2 = d2(q, cents(l))
      val b2 = cents.collect { case (cl, c) if cl != l => d2(q, c) }.min
      (l, a2, b2)
    }
    val want = perVec.groupBy(_._1).toSeq.map { case (l, xs) =>
      (l, xs.size.toLong,
        xs.count(v => v._3 < v._2).toLong,
        xs.map(_._3).sum * 10000L / xs.map(_._2).sum)
    }.sortBy(_._1)
    val got = run("q_cluster_sep").collect().toSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got == want)
    // all labels present; the synthetic labels are NOT cleanly separable, so
    // the misassignment column should be non-trivial somewhere
    assert(want.size == cents.size && want.exists(_._3 > 0))
  }
}
