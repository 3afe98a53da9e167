package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** Exact-semantics fixtures for the reference's scalar quirks (SURVEY.md
  * §5.2#2) — including the DELIBERATE bugs the port must not "fix":
  * parse_boolean's negative-before-positive substring ordering
  * (pet_scraper.py:221-238) and the independent \r / \n escaping
  * (pet_scraper.py:415-417).
  */
class ScalarsSpec extends SparkTestBase {

  /** Evaluate a Column over one string input (null-safe). */
  private def eval(in: String, f: Column => Column): Any = {
    import spark.implicits._
    Seq(Option(in)).toDF("v").select(f(col("v")).as("r")).collect()(0).get(0)
  }

  test("X1 clean_text strips padding and trailing star runs") {
    assert(eval("  Rex**  ", Scalars.cleanText) == "Rex")
    assert(eval("a*b", Scalars.cleanText) == "a*b")   // stars only at end
    assert(eval("***", Scalars.cleanText) == "")
    assert(eval(null, Scalars.cleanText) == "")
  }

  test("X2 parse_boolean: negative list first, substring semantics") {
    assert(eval("No", Scalars.parseBoolean) == false)
    assert(eval("Yes", Scalars.parseBoolean) == true)
    assert(eval("✓", Scalars.parseBoolean) == true)
    assert(eval("✗", Scalars.parseBoolean) == false)
    // the famous quirk: "unknown" contains "n" → negative wins
    assert(eval("unknown", Scalars.parseBoolean) == false)
    // "maybe" has no negative substring but contains "y" → true
    assert(eval("maybe", Scalars.parseBoolean) == true)
    // "only" contains "n" (negative) AND "y" (positive) → negative checked first
    assert(eval("only", Scalars.parseBoolean) == false)
    // tri-state: only null/"" are null; whitespace-only is FALSE
    // (reference: `parse_boolean(t) if t else None`, and bool("".strip()))
    assert(eval(null, Scalars.parseBoolean) == null)
    assert(eval("", Scalars.parseBoolean) == null)
    assert(eval("   ", Scalars.parseBoolean) == false)
    // non-empty, no indicator substring at all → truthy
    assert(eval("zzz", Scalars.parseBoolean) == true)
  }

  test("X3 extract_name_from_about drops the about prefix by position") {
    assert(eval("About Rex", Scalars.extractNameFromAbout) == "Rex")
    assert(eval("  ABOUT Bella ", Scalars.extractNameFromAbout) == "Bella")
    // startswith is case-insensitive, drop is blind 5 chars: "abouts" → "s"
    assert(eval("abouts", Scalars.extractNameFromAbout) == "s")
    assert(eval("Rex", Scalars.extractNameFromAbout) == "Rex")
    assert(eval(null, Scalars.extractNameFromAbout) == "")
  }

  test("X4 newline escape maps EACH of \\r, \\n to a literal backslash-n") {
    assert(eval("a\r\nb", Scalars.escapeNewlines) == "a\\n\\nb") // two escapes!
    assert(eval("a\nb", Scalars.escapeNewlines) == "a\\nb")
    assert(eval("a\rb", Scalars.escapeNewlines) == "a\\nb")
    assert(eval("ab", Scalars.escapeNewlines) == "ab")
  }

  test("X5 bool→string encode is tri-state") {
    import spark.implicits._
    val out = Seq(Some(true), Some(false), None).toDF("b")
      .select(Scalars.encodeBool(col("b")).as("s")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("True", "False", ""))
  }

  test("X6 URL normalization prefixes site-relative hrefs only") {
    assert(eval("/dog/123", Scalars.normalizeUrl) == "https://www.petfinder.com/dog/123")
    assert(eval("https://x/y", Scalars.normalizeUrl) == "https://x/y")
  }

  test("hexHash60 matches the md5-prefix construction exactly") {
    val md  = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = java.lang.Long.parseLong(hex.take(15), 16)
    assert(eval("abc", Scalars.hexHash60) == expect)
  }

  test("isMissing treats null and blank-after-trim as missing (§7.4#6)") {
    assert(eval(null, Scalars.isMissing) == true)
    assert(eval("", Scalars.isMissing) == true)
    assert(eval("  ", Scalars.isMissing) == true)
    assert(eval("x", Scalars.isMissing) == false)
  }
}
