package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Catalog-stat queries over the two testdata tables nothing else exercises
  * (`part`, `supplier`) — the reference's A-family counters (server.py:42-49,
  * 425-428) generalized to grouped min/max/count profiles, the stats sweep a
  * data catalog runs over every table it manages.
  *
  * Aggregates are counts and min/max only — order-independent exact picks, no
  * float summation (SURVEY.md §7.4#2).
  */
object StatsQueries {

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_part_brand_stats",
      "per-brand part profile: count, retail price and size ranges",
      (s, dir) =>
        Tables.part(s, dir)
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n_parts"),
            min(col("p_retailprice")).as("min_price"),
            max(col("p_retailprice")).as("max_price"),
            min(col("p_size")).as("min_size"),
            max(col("p_size")).as("max_size"))
          .orderBy("p_brand"),
      Some("""SELECT p_brand, count(*) AS n_parts,
             |       min(p_retailprice) AS min_price, max(p_retailprice) AS max_price,
             |       min(p_size) AS min_size, max(p_size) AS max_size
             |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    ),

    GraftQuery(
      "q_supplier_nation",
      "suppliers per nation with account-balance range (supplier ⋈ nation)",
      (s, dir) =>
        Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_suppliers"),
            min(col("s_acctbal")).as("min_bal"),
            max(col("s_acctbal")).as("max_bal"))
          .orderBy("n_name"),
      Some("""SELECT n_name, count(*) AS n_suppliers,
             |       min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)
    )
  )
}
