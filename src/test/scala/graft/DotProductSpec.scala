package graft

import org.apache.spark.sql.functions._

import graft.expressions.DotProductLong.dotLong

/** The native dot-product kernel: parity with the built-in higher-order
  * spelling, null semantics, codegen presence, and SQL-name registration via
  * GraftExtensions.
  */
class DotProductSpec extends SparkTestBase {

  import spark.implicits._

  private val builtinDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"

  test("dot_long matches the built-in aggregate/zip_with spelling") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 50).map { _ =>
      (Seq.fill(64)(rng.nextInt(4001).toLong - 2000),
        Seq.fill(64)(rng.nextInt(4001).toLong - 2000))
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        dotLong(col("a"), col("b")).as("native"),
        expr(builtinDot).as("builtin"))
      .filter(col("native") =!= col("builtin")).count()
    assert(diff == 0)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(df.select(dotLong(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("null elements and length mismatches yield null, matching the built-in") {
    val withNull = spark.sql("SELECT array(1L, NULL) AS a, array(1L, 1L) AS b")
      .select(dotLong(col("a"), col("b")).as("native"), expr(builtinDot).as("builtin"))
      .collect()(0)
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
    val mismatch = spark.sql("SELECT array(1L, 2L, 3L) AS a, array(1L, 1L) AS b")
      .select(dotLong(col("a"), col("b")).as("native"), expr(builtinDot).as("builtin"))
      .collect()(0)
    assert(mismatch.isNullAt(0) && mismatch.isNullAt(1))
  }

  test("kernel participates in whole-stage codegen") {
    // spark.range is non-foldable, so the projection must actually run —
    // a literal input would be constant-folded into a LocalTableScan
    val df = spark.range(4)
      .select(expr("array(id, id + 1)").as("a"), expr("array(id + 2, id + 3)").as("b"))
      .select(dotLong(col("a"), col("b")).as("d"))
    // "*(n)" marks a WholeStageCodegen span in the short plan format; the
    // projection carrying dot_long must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("dot_long")),
      s"dot_long not in a codegen span:\n$plan")
    // id=0: [0,1]·[2,3] = 3
    assert(df.orderBy("d").collect()(0).getLong(0) == 3L)
  }

  test("the default session exposes dot_long + scalar names to SQL (no manual register)") {
    // LocalSpark.session wires GraftExtensions at build time (VERDICT r3
    // next-step #8) — the names must resolve WITHOUT a register call here
    val out = spark.sql(
      "SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d, clean_text(' x** ') AS t")
      .collect()(0)
    assert(out.getLong(0) == 32L)
    assert(out.getString(1) == "x")
    // explicit re-registration stays idempotent (notebook / foreign-session path)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT dot_long(array(2L), array(3L)) AS d").collect()(0).getLong(0) == 6L)
  }
}
