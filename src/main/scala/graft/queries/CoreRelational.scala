package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational

/** Core relational surface: scans/projections (S1/P1/P2), key matching
  * (J1–J3), counts (A1/A4), windows (§2.7–2.8). SURVEY.md §2 citations on
  * each entry.
  */
object CoreRelational {

  val queries: Seq[GraftQuery] = Seq(

    // S1/P1: scan + projection + pushed filter (pet_scraper.py:426-451).
    // Plan check: filter and 4-column pruning must reach the parquet scan.
    GraftQuery(
      "q_scan_project",
      "scan lineitem, project 4 cols, filter l_quantity > 30",
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") > 30)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity > 30
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)
    ),

    // P2: stamp a literal column (pet_scraper.py:633-634).
    GraftQuery(
      "q_add_literal",
      "add constant pet_type column to a projection",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), lit("dog").as("pet_type"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, 'dog' AS pet_type
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // A1: table count (server.py:479-486).
    GraftQuery(
      "q_count_rows",
      "full-table count",
      (s, dir) => Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem")
    ),

    // A4: monotonic counters as a grouped count (server.py:42-49, 209).
    GraftQuery(
      "q_group_count",
      "per-event-type counters",
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type")
    ),

    // J1: distinct key-set build (server.py:75-88).
    GraftQuery(
      "q_distinct_keys",
      "distinct customer keys referenced by orders",
      (s, dir) =>
        Relational.distinctKeys(Tables.orders(s, dir), "o_custkey").orderBy("o_custkey"),
      Some("SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey")
    ),

    // J2: semi-join membership probe (server.py:91-93, 200-203).
    GraftQuery(
      "q_semi_join",
      "customers that have at least one order (left semi)",
      (s, dir) =>
        Relational.semiJoin(
          Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
          Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")),
          "c_custkey"
        ).orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |ORDER BY c_custkey""".stripMargin)
    ),

    // J3: anti-join new-records filter (server.py:194-207). The probe is
    // restricted to high-value orders so the anti side is non-empty at every
    // scale factor.
    GraftQuery(
      "q_anti_join",
      "customers with no high-value orders (left anti, non-empty at every sf)",
      (s, dir) =>
        Relational.antiJoin(
          Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
          Tables.orders(s, dir).filter(col("o_totalprice") > 350000.0)
            .select(col("o_custkey").as("c_custkey")),
          "c_custkey"
        ).orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000.0)
             |ORDER BY c_custkey""".stripMargin)
    ),

    // §2.7 top-k per group: the 12-links-per-page cap (link_scraper.py:100-113).
    GraftQuery(
      "q_topk_per_group",
      "top-12 lineitems per supplier by extendedprice",
      (s, dir) =>
        Relational.topKPerGroup(
          Tables.lineitem(s, dir)
            .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
          partitionCols = Seq(col("l_suppkey")),
          orderCols = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
          k = 12
        ).withColumn("rn", col("rn").cast("long")).orderBy("l_suppkey", "rn"),
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
             |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             |         CAST(row_number() OVER (PARTITION BY l_suppkey
             |                            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
             |  FROM lineitem) t
             |WHERE rn <= 12 ORDER BY l_suppkey, rn""".stripMargin)
    ),

    // §2.8 pagination window: page enumeration analog (server.py:350).
    GraftQuery(
      "q_pagination_window",
      "25-rows-per-page pagination over orders; per-page stats",
      (s, dir) =>
        Relational.paginate(Tables.orders(s, dir).select("o_orderkey"),
            orderCols = Seq(col("o_orderkey")), pageSize = 25)
          .groupBy("page")
          .agg(count(lit(1)).as("n"), min("o_orderkey").as("first_key"), max("o_orderkey").as("last_key"))
          .orderBy("page"),
      Some("""SELECT page, count(*) AS n, min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
             |FROM (SELECT o_orderkey,
             |             CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 25) AS BIGINT) + 1 AS page
             |      FROM orders) t
             |GROUP BY page ORDER BY page""".stripMargin)
    ),

    // X8: timestamp formatting (pet_scraper.py:115-122, server.py:109).
    GraftQuery(
      "q_date_format",
      "format order timestamps + epoch seconds",
      (s, dir) =>
        Tables.orders(s, dir)
          .select(
            col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
            unix_timestamp(col("o_orderdate")).as("epoch_s"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
             |       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
             |FROM orders ORDER BY o_orderkey""".stripMargin)
    ),

    // P4: field extraction from a semi-structured doc — get_json_object is the
    // testdata analog of the reference's XPath extraction (pet_scraper.py:96-112,
    // 135-161; SURVEY.md §2.2 P4).
    GraftQuery(
      "q_extract_json",
      "extract props.k from events JSON",
      (s, dir) =>
        Tables.events(s, dir)
          // ONE from_json parse feeding all three fields (VERDICT r5
          // what's-wrong #1: three get_json_object calls were three
          // independent parses of the same document — at 100 TB that triples
          // the dominant cost). CollapseProject leaves the multi-referenced
          // non-cheap JsonToStructs in its own projection instead of inlining
          // it per field, so the plan parses once per row (pinned in
          // PlanShapeSpec). PERMISSIVE mode maps malformed documents to null
          // fields, matching get_json_object / DuckDB json_extract_string.
          .withColumn("j", from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k STRING, missing STRING")))
          .select(
            col("event_id"),
            col("j.k").as("k_str"),
            // try_cast, not cast: Verify/Bench leave ANSI mode on, so a
            // malformed $.k must yield null (as DuckDB's TRY_CAST does), not
            // throw (SURVEY.md §7.4; ADVICE r1).
            col("j.k").try_cast("long").as("k_val"),
            col("j.missing").as("absent"))
          .orderBy("event_id"),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str,
             |       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             |       json_extract_string(props, '$.missing') AS absent
             |FROM events ORDER BY event_id""".stripMargin)
    ),

    // J7 bag set-operations — INTERSECT ALL / EXCEPT ALL, the MULTISET
    // algebra the join family (equality on keys) and DISTINCT set ops
    // cannot express: per-element multiplicities min(a, b) and max(a − b, 0)
    // respectively. The probe compares the (event_type, value-cents-mod-7)
    // bags of two user populations — the distributional-parity check
    // (multiplicity matters: "both cohorts error at the same RATE" is a bag
    // question, not a set question). Spark rewrites both to a two-sided
    // count aggregate + replicate_rows generate — one shuffle each, no
    // pairwise anything; the re-aggregation to (op, type, m, n) keeps the
    // graded output bounded.
    GraftQuery(
      "q_bag_setops",
      "INTERSECT ALL / EXCEPT ALL multiplicities between two user cohorts' event bags",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_type"),
            expr("pmod(cast(round(value * 100) as bigint), 7)").as("m"),
            col("user_id"))
        val a = e.filter(col("user_id") % 2 === 0).drop("user_id")
        val b = e.filter(col("user_id") % 2 =!= 0).drop("user_id")
        val inter = a.intersectAll(b)
          .groupBy("event_type", "m").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect_all"))
        val exc = a.exceptAll(b)
          .groupBy("event_type", "m").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all"))
        inter.unionByName(exc)
          .select("op", "event_type", "m", "n")
          .orderBy("op", "event_type", "m")
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |         CASE WHEN CAST(round(value * 100) AS BIGINT) % 7 < 0
             |              THEN CAST(round(value * 100) AS BIGINT) % 7 + 7
             |              ELSE CAST(round(value * 100) AS BIGINT) % 7 END AS m,
             |         user_id
             |  FROM events),
             |a AS (SELECT event_type, m FROM e WHERE user_id % 2 = 0),
             |b AS (SELECT event_type, m FROM e WHERE user_id % 2 <> 0),
             |i AS (SELECT event_type, m FROM a INTERSECT ALL SELECT event_type, m FROM b),
             |x AS (SELECT event_type, m FROM a EXCEPT ALL SELECT event_type, m FROM b)
             |SELECT 'intersect_all' AS op, event_type, m, count(*) AS n
             |FROM i GROUP BY 2, 3
             |UNION ALL
             |SELECT 'except_all' AS op, event_type, m, count(*) AS n
             |FROM x GROUP BY 2, 3
             |ORDER BY op, event_type, m""".stripMargin)
    )
  )
}
