package graft

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.functions.col

import graft.operators.Relational

/** ScalaCheck properties for the J4/P3 merge laws (SURVEY.md §5.2#3) — the
  * invariants pet_scraper.py:431-466 maintains by construction: exactly one
  * row per key, update-wins on conflict, null-update keeps existing,
  * re-applying a batch is a fixpoint.
  */
object UpsertProperties extends Properties("upsertMerge") {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val keyGen: Gen[String] = Gen.chooseNum(1, 25).map(i => s"k$i")
  private val rowGen: Gen[(String, Option[String], Option[Int])] =
    for {
      k <- keyGen
      v <- Gen.option(Gen.alphaStr.map(_.take(6)))
      n <- Gen.option(Gen.chooseNum(0, 99))
    } yield (k, v, n)

  /** Distinct-keyed random table (merge inputs must satisfy the invariant). */
  private val tableGen: Gen[List[(String, Option[String], Option[Int])]] =
    Gen.listOfN(12, rowGen).map(_.distinctBy(_._1))

  property("one row per key; key set is the union") = Prop.forAll(tableGen, tableGen) {
    (e, u) =>
      val out = Relational.upsertMerge(
        e.toDF("link", "v", "n"), u.toDF("link", "v", "n"), "link").collect()
      val keys = out.map(_.getString(0))
      keys.toSet == (e.map(_._1) ++ u.map(_._1)).toSet && keys.length == keys.distinct.length
  }

  property("non-null update wins; null update keeps existing (P3)") =
    Prop.forAll(tableGen, tableGen) { (e, u) =>
      val eMap = e.map(r => r._1 -> r).toMap
      val uMap = u.map(r => r._1 -> r).toMap
      val out = Relational.upsertMerge(
        e.toDF("link", "v", "n"), u.toDF("link", "v", "n"), "link").collect()
      out.forall { r =>
        val k    = r.getString(0)
        val want = uMap.get(k).flatMap(_._2).orElse(eMap.get(k).flatMap(_._2))
        Option(r.getString(1)) == want
      }
    }

  property("re-applying the same batch is a fixpoint") = Prop.forAll(tableGen, tableGen) {
    (e, u) =>
      val once  = Relational.upsertMerge(e.toDF("link", "v", "n"), u.toDF("link", "v", "n"), "link")
      val twice = Relational.upsertMerge(once, u.toDF("link", "v", "n"), "link")
      once.orderBy("link").collect().toSeq == twice.orderBy("link").collect().toSeq
  }

  property("null-ratio filter is monotone in the threshold (F2)") =
    Prop.forAll(tableGen, Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (t, a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val df     = t.toDF("link", "v", "n")
      val fields = Seq(col("v"), col("n"))
      val keptLo = df.filter(Relational.nullRatioKeep(fields, lo)).count()
      val keptHi = df.filter(Relational.nullRatioKeep(fields, hi)).count()
      keptLo <= keptHi // raising the allowed-missing threshold keeps more rows
    }
}
