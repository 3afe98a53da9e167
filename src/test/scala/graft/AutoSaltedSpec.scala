package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Properties of the histogram-driven skew join (VERDICT r6 #6): the
  * measured fan-out salts ONLY heavy keys, the result stays bag-equal to a
  * plain inner equi-join, and the big side's per-(key, salt) cell — the unit
  * a shuffle task actually receives — is bounded near total/targetTasks.
  */
class AutoSaltedSpec extends SparkTestBase {

  import spark.implicits._

  private val Target = 16L

  // one very hot key (≈70%), one warm (≈20%), a cold tail; some keys exist
  // on only one side; the small side has a duplicate-key row (fan-out 2)
  private def skewedBig(n: Int): Seq[(String, Int)] = {
    val rng = new Random(7)
    (1 to n).map { i =>
      val r = rng.nextInt(10)
      val k = if (r < 7) "hot" else if (r < 9) "warm" else s"cold${rng.nextInt(20)}"
      (k, i)
    } :+ (("bigonly", 0))
  }

  private val small = Seq(
    ("hot", "H1"), ("hot", "H2"), ("warm", "W"),
    ("cold3", "C"), ("smallonly", "S")).toDF("k", "tag")

  test("heavyKeyFanout flags only heavy keys, with the report's formula") {
    val big = skewedBig(2000).toDF("k", "v")
    val cnts = big.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = cnts.values.sum
    val heavy = Relational.heavyKeyFanout(big, "k", Target)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // formula parity per key; only keys above total/Target appear
    val expected = cnts.collect {
      case (k, c) if (c * Target + total - 1) / total > 1 =>
        k -> ((c * Target + total - 1) / total)
    }
    assert(heavy == expected)
    assert(heavy.keySet == Set("hot", "warm"))
    assert(heavy.size <= Target) // broadcastability bound holds by construction
  }

  test("autoSalted is bag-equal to the plain inner equi-join under skew") {
    val big = skewedBig(3000).toDF("k", "v")
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "tag").collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap
    assert(bag(Relational.autoSalted(big, small, "k", Target)) == bag(big.join(small, "k")))
  }

  test("salted big side bounds rows per (key, salt) cell near total/target") {
    val big = skewedBig(4000).toDF("k", "v")
    val total = big.count()
    val (saltedBig, saltedSmall) = Relational.saltedSides(big, small, "k", Target)
    val cellMax = saltedBig.groupBy("k", "__graft_salt").count()
      .agg(max("count")).collect()(0).getLong(0)
    // a cell averages cnt/salt_n ≤ total/Target rows; allow 1.5× for the
    // content-hash-mod distribution's fluctuation. Unsalted, the hot cell
    // would hold ~70% of the table — an order of magnitude over this bound.
    assert(cellMax <= total * 3 / (Target * 2),
      s"cellMax=$cellMax total=$total target=$Target")
    // small side replicates exactly fan-out× per heavy key, 1× otherwise
    val repl = saltedSmall.groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val heavy = Relational.heavyKeyFanout(big, "k", Target)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(repl(("hot", "H1")) == heavy("hot"))
    assert(repl(("hot", "H2")) == heavy("hot"))
    assert(repl(("warm", "W")) == heavy("warm"))
    assert(repl(("cold3", "C")) == 1L)
    assert(repl(("smallonly", "S")) == 1L)
  }

  test("big-side salt derives from row content: invariant under repartitioning") {
    // a positional salt (monotonically_increasing_id) changes with the
    // physical row layout — exactly what a stage retry perturbs (ADVICE r7);
    // a content hash must assign every row the same salt no matter how the
    // input happens to be partitioned
    val big = skewedBig(1000).toDF("k", "v")
    def salts(df: org.apache.spark.sql.DataFrame) =
      Relational.saltedSides(df, small, "k", Target)._1
        .select("k", "v", "__graft_salt").collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(salts(big.repartition(7)) == salts(big.repartition(3)))
  }

  test("literal duplicate rows share a salt but never break bag-equality") {
    // the content hash's documented limitation: rows identical in EVERY
    // column land on one salt (no spread for them) — correctness must be
    // untouched, the join stays bag-equal with duplicate multiplicity kept
    val big = (skewedBig(500) ++ Seq.fill(200)(("hot", 1))).toDF("k", "v")
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "tag").collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap
    assert(bag(Relational.autoSalted(big, small, "k", Target)) == bag(big.join(small, "k")))
  }

  test("cold-only data takes the degenerate path: no heavy keys, plain join") {
    val big = (1 to 100).map(i => (s"k${i % 50}", i)).toDF("k", "v")
    assert(Relational.heavyKeyFanout(big, "k", Target).isEmpty)
    val sm = Seq(("k1", "A"), ("k2", "B")).toDF("k", "tag")
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "tag").collect().map(_.toSeq).sortBy(_.toString)
    assert(bag(Relational.autoSalted(big, sm, "k", Target)).toSeq == bag(big.join(sm, "k")).toSeq)
  }
}
