package graft.queries

object SimilarityQueries {
  val queries: Seq[GraftQuery] = Seq()
}
