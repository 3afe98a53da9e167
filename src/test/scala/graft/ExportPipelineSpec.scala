package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.Scalars
import graft.operators.Relational

/** Golden pipeline test (SURVEY.md §5.2#4): a pets-shaped fixture (FIXTURES.md
  * A1) pushed through validate → merge → export encoding, compared against
  * hand-computed golden rows — the composition the reference runs as
  * scrape → should_skip_pet → save_pet_to_csv → CSV download
  * (pet_scraper.py:364-498, docs/index.html:373-375).
  */
class ExportPipelineSpec extends SparkTestBase {

  import spark.implicits._

  private val exportCols =
    Seq("link", "pet_type", "name", "spayed_neutered", "about_me")

  test("ingest → validate → merge → CSV-encode produces the golden rows") {
    // Existing table: one complete row.
    val existing = Seq(
      ("L1", "dog", "Rex", Some(true), Some("Good boy"))
    ).toDF("link", "pet_type", "name", "spayed_neutered", "about_me")

    // Incoming batch: placeholder name (dropped, F1), mostly-empty row
    // (dropped, F2), an update to L1 (merged, J4), and a new row with \r\n
    // in about_me and a parse_boolean quirk value.
    val incoming = Seq(
      ("L9", "dog", "Dog", Some(true), Some("placeholder")),     // F1 drop
      ("L8", "dog", "", None, None),                             // F2 drop (3/4 missing)
      ("L1", "dog", "Rex", Some(false), None),                   // J4 update, about preserved
      ("L2", "cat", "Mia", None, Some("line1\r\nline2"))         // new
    ).toDF("link", "pet_type", "name", "spayed_neutered", "about_me")

    val checked   = Seq(col("name"), col("spayed_neutered"), col("about_me"),
      col("pet_type"))
    val validated = Relational.placeholderFilter(incoming, col("name"), Seq("dog", "cat"))
      .filter(Relational.nullRatioKeep(checked, 0.5))
    val merged = Relational.upsertMerge(existing, validated, "link")

    val encoded = Relational.fixedProjection(
      merged
        .withColumn("spayed_neutered", Scalars.encodeBool(col("spayed_neutered")))
        .withColumn("about_me", Scalars.escapeNewlines(col("about_me"))),
      exportCols)

    val got = encoded.orderBy("link").collect().toSeq
    val golden = Seq(
      Row("L1", "dog", "Rex", "False", "Good boy"),        // update won, about kept
      Row("L2", "cat", "Mia", "", "line1\\n\\nline2")      // tri-state "", two escapes
    )
    assert(got == golden)
  }

  test("fixture quirk coverage: parse_boolean over the A1 boolean strings") {
    val parsed = Seq("Yes", "unknown", "✓", "", "No")
      .toDF("raw").select(Scalars.parseBoolean(col("raw")).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(parsed.toSeq == Seq(true, false, true, null, false))
  }
}
