package graft

/** [[Tables.registerViews]] — the `spark.sql(...)` driving surface.
  *
  * The claim under test: after one registration call, a SQL user sees the
  * SAME engine the DataFrame user does — identical schemas (including the
  * events timestamp normalization, which raw `spark.read.parquet` does NOT
  * apply), identical results through joins, and the X-family scalar
  * functions resolvable by name. Each check compares the SQL text form
  * against its Column-DSL twin, so the two surfaces cannot drift.
  */
class SqlFacadeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("views expose every corpus table with the normalized schema") {
    Tables.registerViews(spark, dir)
    Tables.accessors.keys.foreach { n =>
      val viaSql = spark.sql(s"SELECT * FROM $n")
      val viaDf  = Tables.accessors(n)(spark, dir)
      assert(viaSql.schema === viaDf.schema, s"schema drift on view $n")
      assert(viaSql.count() === viaDf.count(), s"row-count drift on view $n")
    }
    // the normalization proof: unix_micros(ts) must RESOLVE on the view —
    // it rejects the raw TIMESTAMP_NTZ/long physical flavors, so this line
    // failing means the view bypassed Tables.events
    val lo = spark.sql("SELECT min(unix_micros(ts)) FROM events").head.getLong(0)
    assert(lo > 0L, "events view lost the timestamp normalization")
  }

  test("a SQL join over the views equals its DataFrame twin") {
    Tables.registerViews(spark, dir)
    import org.apache.spark.sql.functions._
    val sql = spark.sql(
      """SELECT n.n_name AS nation, count(*) AS n_cust
        |FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        |GROUP BY n.n_name ORDER BY nation""".stripMargin).collect()
    val df = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("nation").collect()
    assert(sql.toSeq === df.toSeq)
  }

  test("X-family scalar functions resolve inside spark.sql over the views") {
    Tables.registerViews(spark, dir)
    // clean_text's trailing-*-run strip, evaluated through the SQL name over
    // a view — the full SQL-only path a reference user would drive
    val got = spark.sql(
      "SELECT clean_text(' a* ') AS c, parse_boolean('unknown') AS b").head
    assert(got.getString(0) === "a")
    assert(!got.getBoolean(1), "parse_boolean lost the 'n'-substring quirk")
    // over a real view column: must run without resolution errors and keep
    // row count (clean_text is total on strings)
    val n = spark.sql("SELECT clean_text(text) FROM documents").count()
    assert(n === Tables.documents(spark, dir).count())
  }
}
