package graft.model

import org.apache.spark.sql.types._

/** The reference's table shape (SURVEY.md §1.2; FIXTURES.md A1): 17 columns
  * keyed by `link`, declared order normative (`get_pet_csv_fields`,
  * pet_scraper.py:341-361). The engine stores real types (nullable booleans
  * for the tri-state flags, pet_scraper.py:306-322) and only stringifies at
  * the CSV export boundary (Export.encodeForCsv).
  */
object PetSchema {

  /** Declared export column order — byte-for-byte the reference's header. */
  val columns: Seq[String] = Seq(
    "link", "pet_type", "name", "location", "age", "gender", "size", "color",
    "breed", "spayed_neutered", "vaccinated", "special_needs",
    "kids_compatible", "dogs_compatible", "cats_compatible", "about_me",
    "image")

  /** The six tri-state boolean flags (export as "True"/"False"/""). */
  val boolColumns: Set[String] = Set(
    "spayed_neutered", "vaccinated", "special_needs",
    "kids_compatible", "dogs_compatible", "cats_compatible")

  /** Engine-internal schema: typed, nullable (null = field missing). */
  val schema: StructType = StructType(columns.map {
    case c if boolColumns(c) => StructField(c, BooleanType, nullable = true)
    case "link"              => StructField("link", StringType, nullable = false)
    case c                   => StructField(c, StringType, nullable = true)
  })

  /** Typed record for Dataset[Pet] call sites (record-at-a-time validation). */
  final case class Pet(
      link: String,
      pet_type: Option[String],
      name: Option[String],
      location: Option[String],
      age: Option[String],
      gender: Option[String],
      size: Option[String],
      color: Option[String],
      breed: Option[String],
      spayed_neutered: Option[Boolean],
      vaccinated: Option[Boolean],
      special_needs: Option[Boolean],
      kids_compatible: Option[Boolean],
      dogs_compatible: Option[Boolean],
      cats_compatible: Option[Boolean],
      about_me: Option[String],
      image: Option[String])

  /** The 15 columns checked by the quality/verification filters
    * (pet_scraper.py:387-405: everything except `link` and `pet_type`).
    */
  val checkedColumns: Seq[String] =
    columns.filterNot(c => c == "link" || c == "pet_type")
}
