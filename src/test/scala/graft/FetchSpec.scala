package graft

import org.apache.spark.sql.functions._

import graft.sources.Fetch

/** The S2/S3/S4 source path with the stub fetcher: URL templating, executor-
  * side fetch, positional XPath slot extraction, blank-guard, and URL
  * normalization — end-to-end over a (page, pet_type) enumeration.
  */
class FetchSpec extends SparkTestBase {

  import spark.implicits._

  test("paged enumeration → fetch → 12-slot extract → normalized links") {
    val pages = Seq((1, "dog"), (2, "cat")).toDF("page", "pet_type")
    val urls  = Fetch.withSearchUrls(pages)
    assert(urls.select("url").as[String].collect().toSet ==
      Set("https://www.petfinder.com/search/dogs-for-adoption/?page=1",
          "https://www.petfinder.com/search/cats-for-adoption/?page=2"))

    val fetched = Fetch.fetchPages(urls, "url", Fetch.stubSearchPageFetcher())
    val links   = Fetch.extractLinks(fetched, "html")

    val perPage = links.groupBy("page").count().as[(Int, Long)].collect().toMap
    // 12 slots, one deliberately blank → 11 survive the F5 guard
    assert(perPage == Map(1 -> 11L, 2 -> 11L))

    // every link absolute after X6 normalization, slot order preserved
    val all = links.select("link").as[String].collect()
    assert(all.forall(_.startsWith("https://www.petfinder.com/pet/")))
    val slots = links.filter(col("page") === 1).orderBy("slot")
      .select("slot").as[Int].collect().toSeq
    assert(slots == slots.sorted && slots.length == 11)
  }
}
