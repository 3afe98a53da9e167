package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.Scalars

/** S2/S3/S4 source plumbing (SURVEY.md §2.1): the reference's HTTP HTML
  * fetch path — search-page URL templating (server.py:185), proxy fetch
  * (pet_scraper.py:60-93, link_scraper.py:28-63), and the 12 positional
  * link-slot extraction (link_scraper.py:100-145) — re-expressed as
  * executor-side operators.
  *
  * The fetch function is PLUGGABLE: this environment has no egress, so tests
  * inject [[stubSearchPageFetcher]] (a deterministic HTML synthesizer), while
  * a production build injects an HTTP client closure (S2) or a
  * rendering-proxy client with JS-wait knobs (S3). Everything around the
  * fetcher — URL templating, partition-wise client reuse, XPath slot
  * extraction, URL normalization — is the real engine path either way.
  *
  * Scale posture: fetches run `mapPartitions` on executors (one client init
  * per partition, streamed rows — never through the driver); extraction and
  * normalization are codegen'd built-ins. Combined with
  * [[graft.streaming.Ingest.pagedSource]] this is the reference's unbounded
  * ingest front end, distributed.
  */
object Fetch {

  /** url → document body. Implementations must be serializable (shipped to
    * executors); a real one wraps an HTTP client initialized lazily so the
    * closure serializes cheaply.
    */
  type Fetcher = String => String

  /** The reference's search-page URL template (server.py:185). */
  def searchUrl(page: org.apache.spark.sql.Column, petType: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(s"${Scalars.PetfinderBase}/search/"), petType,
      lit("s-for-adoption/?page="), page.cast("string"))

  /** Stamp `url` onto a (page, pet_type) enumeration (S4's offset → URL map). */
  def withSearchUrls(pages: DataFrame): DataFrame =
    pages.withColumn("url", searchUrl(col("page"), col("pet_type")))

  /** Deterministic stub fetcher: synthesizes a well-formed search page with
    * `slots` anchor slots, some site-relative (exercising X6 normalization)
    * and one blank (exercising the F5 empty guard). Replaced by an HTTP
    * client in production; everything downstream is identical.
    */
  def stubSearchPageFetcher(slots: Int = 12): Fetcher = url => {
    val anchors = (1 to slots).map { i =>
      val href =
        if (i == slots) ""                                   // blank slot (F5)
        else if (i % 2 == 0) s"/pet/p${math.abs(url.hashCode % 1000)}-$i" // relative (X6)
        else s"${Scalars.PetfinderBase}/pet/p${math.abs(url.hashCode % 1000)}-$i"
      s"""<a href="$href">pet $i</a>"""
    }.mkString
    s"<html><body><div>$anchors</div></body></html>"
  }

  /** S2/S3: executor-side document fetch. One fetcher per partition (where a
    * real client initializes its connection pool / browser context once),
    * rows streamed — the distributed form of the reference's
    * one-shared-browser loop (pet_scraper.py:604-613).
    */
  def fetchPages(df: DataFrame, urlCol: String, fetcher: Fetcher): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("html", StringType))
    val idx = df.schema.fieldIndex(urlCol)
    df.mapPartitions { rows =>
      // real fetcher: init client here; iterator wraps per-row fetch + retry
      rows.map(r => Row.fromSeq(r.toSeq :+ fetcher(r.getString(idx))))
    }(RowEncoder.encoderFor(outSchema))
  }

  /** P5: the 12 fixed positional slots, via `xpath_string` per slot (the
    * engine analog of link_scraper.py:100-113's hard-coded XPaths), blanks
    * dropped (F5), site-relative hrefs normalized (X6), position preserved.
    */
  def extractLinks(df: DataFrame, htmlCol: String, slots: Int = 12): DataFrame = {
    val slotExprs = (1 to slots).map(i =>
      expr(s"xpath_string($htmlCol, '/html/body/div/a[$i]/@href')"))
    df
      .withColumn("__slots", array(slotExprs: _*))
      .select(col("*"), posexplode(col("__slots")).as(Seq("slot", "href")))
      .filter(col("href").isNotNull && length(trim(col("href"))) > 0)
      .withColumn("link", Scalars.normalizeUrl(col("href")))
      .drop("__slots", "href")
  }
}
