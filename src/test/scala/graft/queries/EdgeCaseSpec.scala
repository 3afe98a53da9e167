package graft.queries

import java.sql.Timestamp

import graft.{SparkEntry, SparkTestBase}

/** Dirty-data robustness net: every graded query must COMPLETE (no ANSI
  * crash, no NPE, no infinite loop) over a corpus of edge-case rows — null
  * and empty texts, sub-shingle-length docs, null lang/props, zero and
  * wrong-dimension vectors, same-instant events, single-event users. At
  * 100 TB every one of these rows exists; a query that throws on them takes
  * the whole stage down. Row-level results are the oracle gate's job — this
  * spec pins "does not blow up" and a few structural invariants.
  */
class EdgeCaseSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("edgecase").toString
    val docs = Seq(
      // (doc_id, text, lang, source, n_chars)
      (0L, null.asInstanceOf[String], "en", "src0", 0L),     // null text
      (1L, "", "en", "src0", 0L),                            // empty text
      (2L, "   ", "de", "src0", 3L),                         // whitespace only
      (3L, "one", "en", "src1", 3L),                         // below 2-gram length
      (4L, "two words", "es", "src1", 9L),                   // below shingle length
      (5L, "exactly three words", "fr", "src1", 19L),        // one shingle
      (6L, "exactly three words", "fr", "src1", 19L),        // exact dup of 5
      (7L, "a b a b a b a b a b", "zh", "src2", 19L),        // degenerate repetition
      (8L, ("x" * 5000) + " tail", "en", "src2", 5006L),     // huge single token
      (9L, "the quick brown fox jumps over the lazy dog", null, "src2", 44L) // null lang
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val emb = Seq(
      (0L, Seq.fill(64)(0.1f), 0),                            // normal
      (1L, Seq.fill(64)(0.1f), 0),                            // exact dup of 0
      (2L, Seq.fill(64)(0.0f), 1),                            // zero vector (n2 = 0)
      (3L, Seq.fill(3)(0.5f), 1),                             // wrong dimension
      (4L, Seq.empty[Float], 2)                               // empty vector
    ).toDF("vec_id", "embedding", "label")
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      // (event_id, ts, user_id, event_type, value, props)
      (0L, t0, 1L, "purchase", 1.0, """{"k": 1}"""),
      (1L, t0, 1L, "view", 2.0, "not json"),                  // same instant as its probe
      (2L, t0, 2L, "error", 3.0, null.asInstanceOf[String]),  // single-event user
      (3L, new Timestamp(t0.getTime + 3600L * 1000), 1L, "error", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    emb.coalesce(1).write.parquet(s"$d/embeddings.parquet")
    ev.coalesce(1).write.parquet(s"$d/events.parquet")
    // TPC-H-ish tables: minimal 1-row frames with the columns the queries touch
    Seq((1L, 1L, "O", 10.0, t0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L, 1L, 1L, 1.0, 10.0, 0.05, 0.02, "N", "O", t0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    Seq((1L, "Customer#1", 1, 100.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    Seq((1, "FRANCE", 1)).toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.parquet(s"$d/nation.parquet")
    Seq((1, "EUROPE")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.parquet(s"$d/region.parquet")
    Seq((1L, "Supplier#1", 1, 50.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .coalesce(1).write.parquet(s"$d/supplier.parquet")
    Seq((1L, "part", "Brand#1", "TYPE A", 1, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.parquet(s"$d/part.parquet")
    d
  }

  test("every graded query completes over the edge-case corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.toString.takeWhile(_ != '\n').take(200)}") }
    }
    assert(failures.isEmpty, s"queries crashed on edge-case data:\n${failures.mkString("\n")}")
  }

  test("edge-case invariants: dup pair found, zero/wrong-dim vectors excluded") {
    val exact = SparkEntry.queries("q_dedup_exact")(spark, dir).collect()
    // docs 5 and 6 are byte-identical → 5 survives carrying count 2, 6 is gone
    assert(exact.exists(r => r.getLong(0) == 5L && r.getLong(2) == 2L) &&
      !exact.map(_.getLong(0)).contains(6L),
      s"exact dup not collapsed: ${exact.mkString(",")}")
    val centroids = SparkEntry.queries("q_label_centroids")(spark, dir).collect()
    // label 1's only Dim-length member is the all-zero vector (zero vectors
    // ARE valid centroid members — only the cosine queries exclude n2=0);
    // its wrong-dim sibling must be filtered, so every centroid is 0 with
    // n=1. label 2 has only an empty vector → no rows at all.
    val l1 = centroids.filter(_.getInt(0) == 1)
    assert(l1.length == 64 && l1.forall(r => r.getLong(2) == 0L && r.getLong(3) == 1L),
      "wrong-dim vector leaked into label-1 centroid")
    assert(!centroids.map(_.getInt(0)).contains(2), "empty vector produced centroid rows")
  }
}
