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

  /** foreachBatch-protocol packing over a [[KeyedTable]] — the third member
    * of the shared-batch trio (dedup index, CMS, packing) a training-data
    * pipeline updates per micro-batch. Reads each source's next free token
    * offset from the published assignments (max end-offset — no separate
    * state table to drift), assigns the batch with the SAME windowed cumsum
    * as the graded `q_pack_sequences`, appends, republishes. Replay-safe by
    * the batch protocol: an already-applied id is a no-op, so the
    * append-then-publish cannot double-assign.
    *
    * Ordering contract (same as [[packStream]]): docs pack in arrival
    * order, doc_id order within a batch — a stream fed in doc_id order
    * reproduces the batch query exactly.
    */
  def updatePacked(table: KeyedTable, docs: org.apache.spark.sql.DataFrame, batchId: Long,
      budget: Long = graft.queries.TextQueries.PackBudget): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    if (table.alreadyApplied(batchId)) return
    val toks = docs
      .withColumn("tok", expr(s"cast(size(${graft.queries.Dialect.wordsSql}) as bigint)"))
      .select("source", "doc_id", "tok")
    val prev = table.read().map(_.select("source", "doc_id", "tok", "pack_id", "pack_off"))
    // next free offset per source = end of its last assigned doc; the base
    // frame is ≤ #sources rows — broadcastable at any stream length
    val based = prev match {
      case Some(p) =>
        val bases = p.groupBy("source")
          .agg(max(col("pack_id") * budget + col("pack_off") + col("tok")).as("base"))
        toks.join(broadcast(bases), Seq("source"), "left")
          .withColumn("base", coalesce(col("base"), lit(0L)))
      case None => toks.withColumn("base", lit(0L))
    }
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = based
      .withColumn("off", col("base") + coalesce(sum("tok").over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("tok"),
        expr(s"off div $budget").as("pack_id"),
        expr(s"off % $budget").as("pack_off"))
    val merged = prev match {
      case Some(p) => p.unionByName(assigned)
      case None    => assigned
    }
    table.publish(merged, Some(batchId))
    ()
  }

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
