package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import Dialect.{duckWordsSql, wordsSql}

/** Catalog-stat queries over the two testdata tables nothing else exercises
  * (`part`, `supplier`) — the reference's A-family counters (server.py:42-49,
  * 425-428) generalized to grouped min/max/count profiles, the stats sweep a
  * data catalog runs over every table it manages.
  *
  * Aggregates are counts and min/max only — order-independent exact picks, no
  * float summation (SURVEY.md §7.4#2).
  */
object StatsQueries {

  /** (table, columns) scope of the A12 catalog-statistics sweep — the ONE
    * place the list lives; both the Spark aggregates and the oracle's
    * UNION branches generate from it.
    */
  private val StatTables: Seq[(String, Seq[String])] = Seq(
    "nation"   -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"     -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))

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

    // The correlated-scalar-subquery pattern ("parts priced above their own
    // brand's average"), DECORRELATED the way a distributed engine must run
    // it: one brand-keyed partial aggregate (count + integer-cent sum), a
    // broadcast join back onto the fact scan, and the avg comparison done by
    // CROSS-MULTIPLICATION — cents·n > s is exactly price > s/n with no
    // division, so the filter and the reported above_bp margin are integer-
    // exact in both engines (no float-avg drift). A naive correlated
    // subquery re-scans the group per row at 100 TB; this is two scans and a
    // #brands-row broadcast, the canonical decorrelation Catalyst itself
    // applies to IN/EXISTS forms.
    GraftQuery(
      "q_above_brand_avg",
      "parts priced above their brand average: integer-cent cross-multiplied margin (bp)",
      (s, dir) => {
        val p = Tables.part(s, dir)
          .select(col("p_brand"), col("p_partkey"),
            expr("cast(round(p_retailprice * 100) as bigint)").as("cents"))
        val b = p.groupBy("p_brand")
          .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
        p.join(broadcast(b), "p_brand")
          .filter(expr("cents * n > sc"))
          .select(col("p_brand"), col("p_partkey"), col("cents"),
            expr("((cents * n - sc) * 10000) div sc").as("above_bp"))
          .orderBy("p_brand", "p_partkey")
      },
      Some("""WITH p AS (
             |  SELECT p_brand, p_partkey,
             |         CAST(round(p_retailprice * 100) AS BIGINT) AS cents
             |  FROM part),
             |b AS (SELECT p_brand, count(*) AS n, sum(cents) AS sc
             |      FROM p GROUP BY p_brand)
             |SELECT p.p_brand, p.p_partkey, p.cents,
             |       CAST((p.cents * b.n - b.sc) * 10000 // b.sc AS BIGINT) AS above_bp
             |FROM p JOIN b USING (p_brand)
             |WHERE p.cents * b.n > b.sc
             |ORDER BY p_brand, p_partkey""".stripMargin)
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
    ),

    // A6 hierarchical subtotals: the corpus mix report at every level in ONE
    // pass — ROLLUP(source, lang) computes the per-(source, lang) cells, the
    // per-source subtotals, and the grand total in a single shuffle (Spark
    // expands the grouping sets map-side; no re-aggregation of the base
    // data per level, which is what three separate groupBys would pay).
    // grouping_id is emitted and leads the ORDER BY: subtotal rows carry
    // NULL group columns, and null-vs-value sort order differs between
    // engines — within one gid the null columns are constant, so ordering
    // by (gid, source, lang) never compares NULL against a value.
    GraftQuery(
      "q_rollup_stats",
      "ROLLUP(source, lang): doc counts and char sums at every level",
      (s, dir) =>
        Tables.documents(s, dir)
          .rollup(col("source"), col("lang"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .select("gid", "source", "lang", "n_docs", "sum_chars")
          // coalesce sentinels, not bare columns: a DATA null in source/lang
          // would otherwise sort NULLS-FIRST in Spark but NULLS-LAST in
          // DuckDB inside the gid=0 group (grouping-introduced nulls are
          // already safe — constant within a gid)
          .orderBy(col("gid"), coalesce(col("source"), lit("")),
            coalesce(col("lang"), lit(""))),
      Some("""SELECT CAST(GROUPING(source, lang) AS BIGINT) AS gid, source, lang,
             |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY ROLLUP (source, lang)
             |ORDER BY gid, coalesce(source, ''), coalesce(lang, '')""".stripMargin)
    ),

    // A6b CUBE: the full grouping-sets lattice — where ROLLUP emits the
    // hierarchy (cell, per-source subtotal, grand total), CUBE adds the
    // CROSS margin (per-lang subtotals ACROSS sources) in the same single
    // pass; gid disambiguates all four levels. One partial-aggregated
    // expand (4 grouping sets per input row pre-aggregate — Spark's Expand
    // runs below the exchange, so the shuffle carries group cells, not
    // corpus rows); same sentinel-coalesce ordering rule as A6.
    GraftQuery(
      "q_cube_stats",
      "CUBE(source, lang): doc counts and char sums at all four lattice levels",
      (s, dir) =>
        Tables.documents(s, dir)
          .cube(col("source"), col("lang"))
          .agg(grouping_id().as("gid"),
            count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          .select("gid", "source", "lang", "n_docs", "sum_chars")
          .orderBy(col("gid"), coalesce(col("source"), lit("")),
            coalesce(col("lang"), lit(""))),
      Some("""SELECT CAST(GROUPING(source, lang) AS BIGINT) AS gid, source, lang,
             |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY CUBE (source, lang)
             |ORDER BY gid, coalesce(source, ''), coalesce(lang, '')""".stripMargin)
    ),

    // A10 exact per-group percentiles — the sort-based percentile AGGREGATE
    // class (Spark `percentile` ↔ DuckDB `quantile_cont`), complementary to
    // E3j's histogram quantiles: the histogram is the corpus-wide scale
    // path (bounded buckets); THIS is the exact answer for moderate-
    // cardinality groups, where the aggregate's per-group counts-map buffer
    // stays small (distinct cents values per event type — the buffer is a
    // value-counts map, not the row list).
    //
    // Exactness across engines: both define quantile_cont at rank p·(n−1)
    // with linear interpolation (verified: [10,20,30,40] @ .25 → 17.5 in
    // both), so the interpolated value is a + frac·(b−a) with frac ∈
    // {0, ¼, ½, ¾} for p ∈ {.25, .5, .75} — scaling by 4 (2 for the
    // median) makes every reported number an INTEGER computed from doubles
    // that are exact (cents < 2^40, fracs are powers-of-two dyadics), so
    // the hash comparison never sees an ulp.
    GraftQuery(
      "q_group_median",
      "per-event-type exact p25/median/p75 (×4/×2/×4 integer-scaled) of value cents",
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            expr("cast(round(4 * percentile(cents, 0.25d)) as bigint)").as("p25_x4"),
            expr("cast(round(2 * percentile(cents, 0.5d)) as bigint)").as("med_x2"),
            expr("cast(round(4 * percentile(cents, 0.75d)) as bigint)").as("p75_x4"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |       CAST(round(4 * quantile_cont(cents, 0.25)) AS BIGINT) AS p25_x4,
             |       CAST(round(2 * quantile_cont(cents, 0.5))  AS BIGINT) AS med_x2,
             |       CAST(round(4 * quantile_cont(cents, 0.75)) AS BIGINT) AS p75_x4
             |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
             |      FROM events) e
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)
    ),

    // A11 Z-order clustering audit — the multi-dimensional data-LAYOUT
    // primitive (Delta OPTIMIZE ZORDER / Iceberg sort-order class): bit-
    // interleave two 10-bit quantized dimensions (doc length in chars and
    // in words) into a 20-bit Morton key, bucket the corpus by the key's
    // top 6 bits, and report each bucket's (x, y) bounding box. The graded
    // claim IS the file-skipping story: a Z-bucket is a tight rectangle in
    // BOTH dimensions at once (sorting by either single dimension leaves
    // the other's per-file min/max spanning the whole domain), so min/max
    // column statistics prune files for predicates on either column. At
    // 100 TB the Morton key is the write-time sort key; here the bucket
    // stands in for the file.
    //
    // The 20-term interleave expression is GENERATED by one Scala loop in
    // both dialects (shiftleft/shiftright ↔ <</>>) — hand-maintained twins
    // of 20 bit terms are exactly the kind of code that drifts. Integer-
    // only math; one partial-aggregated groupBy on the 64-value bucket key.
    GraftQuery(
      "q_zorder_layout",
      "Morton-interleaved (chars × words) Z-buckets with per-bucket bounding boxes",
      (s, dir) => {
        val z = (0 until 10).map(i =>
          s"shiftleft(shiftright(x, $i) & 1, ${2 * i}) + " +
            s"shiftleft(shiftright(y, $i) & 1, ${2 * i + 1})").mkString(" + ")
        Tables.documents(s, dir)
          .select(
            expr("least(n_chars, 1023)").as("x"),
            expr(s"least(cast(size($wordsSql) as bigint), 1023)").as("y"))
          .withColumn("zbucket", expr(s"($z) div 1024"))
          .groupBy("zbucket")
          .agg(count(lit(1)).as("n_docs"),
            min("x").as("x_min"), max("x").as("x_max"),
            min("y").as("y_min"), max("y").as("y_max"))
          .orderBy("zbucket")
      },
      Some {
        val z = (0 until 10).map(i =>
          s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
        s"""WITH d AS (
           |  SELECT least(n_chars, 1023) AS x,
           |         least(len($duckWordsSql), 1023) AS y
           |  FROM documents)
           |SELECT ($z) // 1024 AS zbucket, count(*) AS n_docs,
           |       CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
           |       CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max
           |FROM d GROUP BY 1 ORDER BY zbucket""".stripMargin
      }
    ),

    // A12 catalog statistics sweep — the ANALYZE TABLE surface: per-column
    // row count, null count, and exact distinct count over a table list,
    // emitted as the long (tbl, col, n, n_null, n_distinct) stats relation a
    // cost-based optimizer ingests. ONE scan per table computes every
    // column's stats in a single aggregate (Spark plans the multi-distinct
    // via one Expand — never a scan per column), and the wide stats row
    // melts to long rows ABOVE the aggregate (bounded by #columns). The
    // (table, columns) list is single-sourced: the Spark aggregates AND the
    // oracle's per-table UNION branches are generated from StatTables.
    GraftQuery(
      "q_table_stats",
      "ANALYZE-style per-column null/distinct profile over nation, supplier, part",
      (s, dir) => {
        val per = StatTables.map { case (t, cols) =>
          val aggs = count(lit(1)).as("n") +:
            cols.flatMap(c => Seq(count(col(c)).as(s"nn_$c"),
              countDistinct(col(c)).as(s"nd_$c")))
          val rows = cols.map(c =>
            s"named_struct('col', '$c', 'n_null', n - nn_$c, 'n_distinct', nd_$c)")
          Tables.load(s, dir, t)
            .agg(aggs.head, aggs.tail: _*)
            .select(lit(t).as("tbl"), col("n"),
              explode(expr(rows.mkString("array(", ", ", ")"))).as("st"))
            .select(col("tbl"), col("st.col").as("col"), col("n"),
              col("st.n_null").as("n_null"), col("st.n_distinct").as("n_distinct"))
        }
        per.reduce(_ unionByName _).orderBy("tbl", "col")
      },
      Some {
        val branches = StatTables.flatMap { case (t, cols) =>
          cols.map(c =>
            s"""SELECT '$t' AS tbl, '$c' AS col, count(*) AS n,
               |       count(*) - count($c) AS n_null,
               |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
               |FROM $t""".stripMargin)
        }
        branches.mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col")
      }
    ),

    // A13 equal-frequency binning via ntile — the remaining ranking-window
    // class (row_number/rank grade elsewhere; ntile's equal-COUNT buckets
    // with the SQL-standard larger-buckets-first remainder rule are a
    // different contract than A10's value percentiles): per source, docs
    // split into 4 equal-population length bins — the feature-discretization
    // step (and the per-group form of what a length-bucketed training
    // curriculum does). Ordering key (n_chars, doc_id) is UNIQUE, so both
    // engines assign identical bins; the window partitions by source (never
    // global), and the re-aggregation to (source, bin) bounds the output.
    GraftQuery(
      "q_ntile_bins",
      "per-source ntile(4) equal-frequency length bins: count + char range per bin",
      (s, dir) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("bin", ntile(4).over(w).cast("long"))
          .groupBy("source", "bin")
          .agg(count(lit(1)).as("n_docs"),
            min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
          .orderBy("source", "bin")
      },
      Some("""SELECT source, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
             |       CAST(min(n_chars) AS BIGINT) AS min_chars,
             |       CAST(max(n_chars) AS BIGINT) AS max_chars
             |FROM (SELECT source, n_chars,
             |             ntile(4) OVER (PARTITION BY source
             |                            ORDER BY n_chars, doc_id) AS bin
             |      FROM documents) t
             |GROUP BY source, bin
             |ORDER BY source, bin""".stripMargin)
    ),

    // A7 pivot reshaping: languages to columns — the wide-format mix matrix
    // dashboards consume. Explicit value list (de/en/es/fr/zh), so the plan
    // is ONE partial-aggregated groupBy(source) with conditional counts (no
    // distinct-values pre-pass, no second shuffle); absent cells are 0, not
    // null, in both engines.
    GraftQuery(
      "q_lang_pivot",
      "per-source language mix pivoted to wide format",
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        Tables.documents(s, dir)
          .groupBy(col("source"))
          .pivot("lang", langs)
          .agg(count(lit(1)))
          .select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
          .orderBy("source")
      },
      Some("""SELECT source,
             |       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
             |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
             |       CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
             |       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
             |       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),

    // A7c UNPIVOT/melt — the INVERSE reshaping of A7's pivot, graded as the
    // round trip: the same wide per-source language matrix is built (pivot),
    // then melted back to long (source, lang, n) — the wide-export-to-
    // long-model shape every feature pipeline needs in both directions.
    // Zero cells survive the melt (UNPIVOT drops NULLs, not zeros; the wide
    // stage coalesces absent cells to 0 first), so the long output is the
    // full dense #sources × 5 grid — melt must not silently re-sparsify.
    //
    // Scale shape: the melt itself is an Expand (5 rows per wide row) ABOVE
    // the already-aggregated pivot — row count is #sources × langs, never
    // corpus × langs; the only corpus-sized stage is the pivot's one
    // partial-agg shuffle.
    GraftQuery(
      "q_unpivot",
      "pivot→melt round trip: wide language matrix unpivoted back to long",
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        Tables.documents(s, dir)
          .groupBy(col("source"))
          .pivot("lang", langs)
          .agg(count(lit(1)))
          .select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
          .unpivot(Array(col("source")), langs.map(col).toArray, "lang", "n")
          .orderBy("source", "lang")
      },
      Some("""WITH wide AS (
             |  SELECT source,
             |         CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
             |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
             |         CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
             |         CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
             |         CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
             |  FROM documents GROUP BY source)
             |SELECT source, lang, n
             |FROM wide UNPIVOT (n FOR lang IN (de, en, es, fr, zh))
             |ORDER BY source, lang""".stripMargin)
    ),

    // A7b ordered string aggregation (listagg): the "reduce a group to one
    // delimited string" export shape. Determinism rule: the collected set is
    // SORTED before joining (collect_set order is partition-dependent;
    // string_agg without ORDER BY likewise) — array_sort on the Spark side,
    // ORDER BY inside string_agg on DuckDB's.
    GraftQuery(
      "q_lang_agg",
      "per-source sorted comma-joined language list + distinct count",
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy(col("source"))
          .agg(
            concat_ws(",", array_sort(collect_set(col("lang")))).as("langs"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy("source"),
      Some("""SELECT source,
             |       coalesce(string_agg(DISTINCT lang, ',' ORDER BY lang), '') AS langs,
             |       count(DISTINCT lang) AS n_langs
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    ),

    // A8 the classic star-join revenue report, graded exactly: the flagship
    // entry() shape (lineitem ⋈ orders ⋈ customer ⋈ nation) with money
    // quantized to integer cents and discounts to basis points FIRST, so the
    // revenue sum is exact bigint arithmetic — order-independent, hence
    // oracle-checkable (a double sum's value depends on reduction order;
    // entry() stays smoke-only for exactly that reason).
    //
    // Join posture at 100 TB: lineitem ⋈ orders shuffles on o_orderkey and
    // orders ⋈ customer on o_custkey (both sides fact-scale — they grow with
    // the data); only nation (25 rows, bounded) is force-broadcast. The
    // aggregate is partial before its exchange on the (nation, month) key.
    GraftQuery(
      "q_revenue_monthly",
      "revenue (exact integer cents x bp) per nation per month, star join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"),
            (expr("cast(round(l_extendedprice * 100) as bigint)") *
              (lit(10000L) - expr("cast(round(l_discount * 10000) as bigint)"))).as("rev"))
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
        val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("ym"))
          .agg(sum("rev").as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("n_name", "ym")
      },
      Some("""SELECT n_name, ym, CAST(sum(rev) AS BIGINT) AS revenue, count(*) AS n_items
             |FROM (
             |  SELECT o.o_custkey, strftime(o.o_orderdate, '%Y-%m') AS ym,
             |         CAST(round(l.l_extendedprice * 100) AS BIGINT) *
             |           (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)) AS rev
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) lo
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name, ym ORDER BY n_name, ym""".stripMargin)
    )
  )
}
