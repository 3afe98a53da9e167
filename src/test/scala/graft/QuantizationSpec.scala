package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Property pins for the int8 quantization math behind `q_embed_quantize`,
  * evaluated through the SAME SQL expressions the graded query runs (factored
  * as [[SimilarityQueries.QuantCodesSql]]/QuantErrsSql), over seeded random
  * vectors plus adversarial extremes. Pins two invariants the offset
  * floor-division construction promises:
  *
  *  - codes stay in the int8 symmetric range [−127, 127] (|127·x/m| ≤ 127
  *    exactly, and round-half-up cannot leave the range);
  *  - reconstruction error ≤ m div 254 + 1 per element (m/254 from code
  *    rounding + 1/2 from dequantization rounding, both in milli-units).
  *
  * A regression in either (a sign slipping through truncating division, an
  * off-by-one in an offset) breaks these long before the oracle hash does —
  * and with a readable message instead of a hash mismatch.
  */
class QuantizationSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val vectors: Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(42)
    val random = Seq.fill(200) {
      // magnitudes spanning tiny (±3) through far beyond the corpus (±10^6)
      val scale = math.pow(10, rnd.nextInt(7)).toLong.max(3L)
      Seq.fill(16)(rnd.nextLong() % scale)
    }
    val extremes = Seq(
      Seq.fill(16)(0L),                         // zero vector (m clamps to 1)
      Seq.fill(16)(1L),                         // all-ones, m = 1
      Seq.fill(16)(-1L),                        // all-minus-ones
      Seq(1000000L) ++ Seq.fill(15)(-1000000L), // both saturation ends
      Seq(500L, -500L, 499L, -499L, 1L, -1L, 0L, 250L,
        -250L, 127L, -127L, 254L, -254L, 253L, -253L, 2L))
    random ++ extremes
  }

  private lazy val quantized =
    vectors.toDF("x")
      .withColumn("m", expr("greatest(1L, aggregate(x, 0L, (a, v) -> greatest(a, abs(v))))"))
      .withColumn("codes", expr(SimilarityQueries.QuantCodesSql))
      .withColumn("errs", expr(SimilarityQueries.QuantErrsSql))
      .cache()

  test("int8 codes stay in [-127, 127]") {
    val out = quantized
      .filter(expr("exists(codes, c -> c < -127 OR c > 127)"))
      .count()
    assert(out == 0L, s"$out vectors produced codes outside [-127, 127]")
  }

  test("reconstruction error per element is bounded by m div 254 + 1") {
    val out = quantized
      .filter(expr("exists(errs, e -> e > m div 254 + 1)"))
      .count()
    assert(out == 0L, s"$out vectors exceeded the reconstruction error bound")
  }

  test("saturated and zero elements round-trip exactly") {
    // v = ±m must map to code ±127 and reconstruct to exactly ±m; v = 0 to
    // code 0 and error 0 — the anchors a scale-factor bug would move first.
    val bad = quantized
      .filter(expr(
        """exists(zip_with(x, codes, (v, c) -> named_struct('v', v, 'c', c)), p ->
          |  (p.v = m AND p.c <> 127) OR
          |  (p.v = -m AND p.c <> -127) OR
          |  (p.v = 0 AND p.c <> 0))""".stripMargin) ||
        expr("exists(zip_with(x, errs, (v, e) -> named_struct('v', v, 'e', e)), " +
          "p -> abs(p.v) = m AND p.e <> 0)"))
      .count()
    assert(bad == 0L, s"$bad vectors broke the saturation/zero anchors")
  }
}
