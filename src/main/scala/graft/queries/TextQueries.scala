package graft.queries

object TextQueries {
  val queries: Seq[GraftQuery] = Seq()
}
