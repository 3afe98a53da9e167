package graft.queries

object DedupQueries {
  val queries: Seq[GraftQuery] = Seq()
}
