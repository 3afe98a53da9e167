package graft.queries

object PipelineQueries {
  val queries: Seq[GraftQuery] = Seq()
}
