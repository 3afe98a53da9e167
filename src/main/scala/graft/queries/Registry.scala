package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark program over the `sfDir` test tables plus (when
  * SQL-expressible) a DuckDB oracle twin executed by the driver on the same
  * parquet inputs (SURVEY.md §5.2#1).
  *
  * Contract recap (driver): result columns are sorted BY NAME before value
  * hashing, so names must match the oracle exactly; row order matters, so
  * every query ends in an ORDER BY over a unique tuple in both engines
  * (SURVEY.md §7.4#1).
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  lazy val all: Seq[GraftQuery] =
    CoreRelational.queries ++ ScalarQueries.queries ++ FilterMergeQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ TextQueries.queries ++
      EventQueries.queries ++ JoinQueries.queries ++ PipelineQueries.queries ++
      MultimodalQueries.queries ++ StatsQueries.queries

  lazy val byName: Map[String, GraftQuery] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
