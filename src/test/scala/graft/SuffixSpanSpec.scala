package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

/** Pins the suffix-ordered duplicated-span operator (q_longest_dup_span)
  * against a brute-force all-pairs longest-common-token-substring oracle —
  * the query's correctness rests on two non-obvious arguments (adjacency in
  * sorted suffix order captures the max other-doc LCP; bucketing the window
  * by the leading 2-gram loses nothing at span ≥ 3), and this spec holds
  * both to account on corpora the graded fixture can't cover: handcrafted
  * edge shapes and randomized small-vocabulary texts where long verbatim
  * overlaps arise by construction AND by chance.
  */
class SuffixSpanSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Brute force: per doc, the longest contiguous token run shared verbatim
    * with ANY other doc, capped at SfxK (the operator's declared report
    * ceiling) and zeroed below MinSpan — O(docs² · len³), fine at test size.
    */
  private def bruteForce(rows: Seq[(Long, String)]): Map[Long, Long] = {
    val toks = rows.map { case (id, t) => id -> t.trim.split(" +").toSeq }.toMap
    def lcsLen(a: Seq[String], b: Seq[String]): Int = {
      var best = 0
      for (i <- a.indices; j <- b.indices) {
        var k = 0
        while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
        best = math.max(best, k)
      }
      best
    }
    rows.map { case (id, _) =>
      val mine = toks(id)
      val best = toks.collect { case (oid, other) if oid != id => lcsLen(mine, other) }
        .foldLeft(0)(math.max)
      val capped = math.min(best, graft.queries.DedupQueries.SfxK)
      id -> (if (capped >= graft.queries.DedupQueries.MinSpan) capped.toLong else 0L)
    }.toMap
  }

  private def run(rows: Seq[(Long, String)]): Map[Long, Long] =
    graft.queries.DedupQueries.longestDupSpans(docsDf(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("handcrafted edge shapes match brute force") {
    val rows = Seq(
      // exact duplicates, 14 tokens: both report the 12-token cap
      1L -> "a b c d e f g h i j k l m n",
      2L -> "a b c d e f g h i j k l m n",
      // 5-token overlap with doc 1, embedded mid-document
      3L -> "x y c d e f g z w q",
      // exactly MinSpan (3 tokens, "h i j") and nothing longer
      4L -> "p p h i j q q",
      // only a 2-token overlap ("a b"): below MinSpan, reports 0
      5L -> "a b z z z z",
      // no overlap at all
      6L -> "uu vv ww xx yy",
      // shorter than MinSpan: no suffixes generated, reports 0
      7L -> "a b",
      // self-repetition only ("r s t r s t"): same-doc matches must NOT count
      8L -> "r s t r s t")
    val got  = run(rows)
    val want = bruteForce(rows)
    assert(got === want, s"got $got\nwant $want")
    assert(got(1L) == 12L && got(3L) == 5L && got(4L) == 3L && got(5L) == 0L
      && got(7L) == 0L && got(8L) == 0L)
  }

  test("randomized small-vocab corpora match brute force") {
    val rnd   = new Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    for (round <- 1 to 3) {
      val base = (1 to 25).map { id =>
        id.toLong -> Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // plant verbatim spans: doc 26 copies a window of doc 1, doc 27 of doc 2
      val w1   = base.head._2.split(" ").take(4 + rnd.nextInt(10)).mkString(" ")
      val w2   = base(1)._2.split(" ").drop(2).take(6).mkString(" ")
      val rows = base ++ Seq(26L -> s"ee ee ee $w1 dd", 27L -> s"$w2 aa cc")
      assert(run(rows) === bruteForce(rows), s"divergence in round $round")
    }
  }
}
