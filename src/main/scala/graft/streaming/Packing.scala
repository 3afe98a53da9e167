package graft.streaming

/** Streaming form of the E3n sequence packer (`q_pack_sequences`): a
  * per-source running token offset kept in keyed state, so documents are
  * assigned their context-window slot AS THEY ARRIVE — the shape a
  * continuously-ingesting training pipeline needs (the batch query re-packs
  * the whole corpus; this one extends the packing, old docs never
  * reprocessed, state one Long per source).
  *
  * Semantics: docs are packed in ARRIVAL order — batch by batch, doc_id
  * order within a micro-batch (the state API hands the group an unordered
  * iterator; sorting inside the batch makes replays deterministic). Feeding
  * the corpus in global doc_id order therefore reproduces the batch query's
  * assignment exactly, which is how the spec pins parity. Unlike the
  * event-time operators ([[Sessions.sessionizeEventTime]],
  * [[TemporalJoins.asofStream]]) there is no watermark hold-back: packing is
  * an ORDER-dependent fold, so the operator owns no reordering claim — a
  * pipeline that needs doc_id-ordered packs feeds an ordered stream (the
  * paged ingest source does).
  */
object Packing {

  final case class Packed(source: String, doc_id: Long, tok: Long,
      pack_id: Long, pack_off: Long)

  /** Input rows: (source, doc_id, token count). State per source: the next
    * free token offset. Works unchanged on batch datasets (state starts
    * empty), which gives the spec its one-shot parity check.
    */
  def packStream(
      docs: org.apache.spark.sql.Dataset[(String, Long, Long)],
      // default shared with the graded batch query — a retuned PackBudget
      // must move both, or batch-parity silently breaks for default callers
      budget: Long = graft.queries.TextQueries.PackBudget): org.apache.spark.sql.Dataset[Packed] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Packed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[(String, Long, Long)], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, tok) =>
            val p = Packed(src, id, tok, off / budget, off % budget)
            off += tok
            p
          }
          state.update(off)
          out.iterator
      }
  }
}
