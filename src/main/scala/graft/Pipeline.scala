package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Scalars
import graft.model.PetSchema
import graft.operators.{Export, Relational}
import graft.streaming.KeyedTable

/** The reference's three lifecycles (SURVEY.md §3, §7.1) composed from the
  * engine's combinators — the facade a user of the reference switches to:
  *
  *  - [[ingestBatch]] = links → anti-join existing → validate → keyed merge
  *    (`scraping_loop` body, server.py:318-404 + pet_scraper.py:364-466);
  *  - [[compact]] = verification delete-by-predicate + counts
  *    (`verify_all_pets`, server.py:226-315);
  *  - [[serve]] / [[exportCsv]] = the `GET /pets` / `GET /pets.csv` shapes
  *    (server.py:463-518).
  *
  * Batch-mode counterpart of `graft.streaming.Ingest` (which adds the
  * checkpointed unbounded source on top of the same merge).
  */
object Pipeline {

  /** Row validity — the reference's two ingest gates (F1 placeholder name,
    * F2 ≥50% missing fields) as one predicate over the pets shape (resolved
    * against whatever frame it is applied to).
    */
  val ingestValid: Column = {
    val checked = PetSchema.checkedColumns.map(col)
    !Scalars.lowerTrim(col("name")).isin("dog", "cat") &&
      Relational.nullRatioKeep(checked, 0.5)
  }

  /** One ingest batch: keep only NEW links (J3 — "check before scraping to
    * save time"), validate (F1+F2), merge survivors by key (J4). Existing
    * keys are untouched — the reference's loop skips known links before
    * scraping; in-place UPDATES flow through the verification/merge path
    * (KeyedTable.merge), not ingest.
    */
  def ingestBatch(existing: DataFrame, batch: DataFrame): DataFrame = {
    val fresh = Relational.antiJoin(batch, existing.select("link"), "link")
    Relational.upsertMerge(existing, fresh.filter(ingestValid), "link")
  }

  /** Same ingest semantics into a versioned [[KeyedTable]] (atomic publish,
    * S5): anti-join against the current snapshot, validate, merge — one
    * batch, one new snapshot version, idempotent per `batchId`.
    */
  def ingestBatch(table: KeyedTable, batch: DataFrame, batchId: Long): Unit = {
    val fresh = table.read() match {
      case Some(existing) => Relational.antiJoin(batch, existing.select("link"), "link")
      case None           => batch
    }
    table.merge(fresh.filter(ingestValid), batchId)
  }

  /** Verification compaction: a row survives iff fewer than 3 of the 15
    * checked fields are missing (verify.py:9-37, threshold
    * pet_scraper.py:549-568). Returns (survivors, summary{remaining,
    * removed, total}).
    */
  def compact(df: DataFrame): (DataFrame, DataFrame) = {
    val valid = Relational.fieldFailureValid(PetSchema.checkedColumns.map(col), 3)
    (Relational.deleteSurvivors(df, valid), Relational.compactionSummary(df, valid))
  }

  /** The `GET /pets` serving shape: total count stamped on every row,
    * deterministic key order (S7).
    */
  def serve(df: DataFrame): DataFrame =
    df.crossJoin(broadcast(df.agg(count(lit(1)).as("total_count"))))
      .select(col("total_count") +: PetSchema.columns.map(col): _*)
      .orderBy("link")

  /** The `GET /pets.csv` download (S8): declared order, encoded bools,
    * escaped newlines, header.
    */
  def exportCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    Export.writeCsv(df, path, PetSchema.columns, PetSchema.boolColumns, singleFile)
}
