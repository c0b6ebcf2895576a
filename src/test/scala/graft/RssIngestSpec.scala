package graft

import org.apache.spark.sql.functions._

import graft.queries.RssQueries
import graft.sources.{Ingest, Rss}

class RssIngestSpec extends SparkTestBase {
  import spark.implicits._

  test("RSS crawlFlow: parse, whitelist, dedup, creator fallback") {
    val out = Rss.crawlFlow(RssQueries.itemFixtures.toDF("xml")).collect()
    assert(out.length == 3) // evil filtered, duplicate collapsed
    val byUrl = out.map(r => r.getAs[String]("url") -> r).toMap
    assert(byUrl("https://www.newsbtc.com/analysis/eth-outlook")
      .getAs[String]("tag") == "alice") // dc:creator fallback (E16)
    assert(byUrl("https://www.coindesk.com/markets-btc-tops-42k")
      .getAs[String]("tag") == "Markets")
  }

  test("round-13: creator fallback handles multi-line + CDATA + entity-" +
      "escaped authors (parity with from_xml's decoded category text)") {
    val items = Seq(
      // multi-line creator: pre-fix the non-DOTALL regex returned ""
      "<item><title>A</title><link>https://www.coindesk.com/markets-a</link>" +
        "<pubDate>Mon, 01 Jan 2024 00:00:00 +0000</pubDate>" +
        "<dc:creator>John\nSmith</dc:creator></item>",
      // CDATA-wrapped creator: pre-fix the tag kept the CDATA wrapper
      "<item><title>B</title><link>https://www.coindesk.com/markets-b</link>" +
        "<pubDate>Mon, 01 Jan 2024 00:00:00 +0000</pubDate>" +
        "<dc:creator><![CDATA[Jane]]></dc:creator></item>",
      // entity-escaped creator: pre-fix stayed escaped while the category
      // path decodes, splitting one author into two tag values
      "<item><title>C</title><link>https://www.coindesk.com/markets-c</link>" +
        "<pubDate>Mon, 01 Jan 2024 00:00:00 +0000</pubDate>" +
        "<dc:creator>Smith &amp; Co</dc:creator></item>")
    val tags = Rss.crawlFlow(items.toDF("xml")).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("tag")).toMap
    assert(tags("https://www.coindesk.com/markets-a") == "John\nSmith")
    assert(tags("https://www.coindesk.com/markets-b") == "Jane")
    assert(tags("https://www.coindesk.com/markets-c") == "Smith & Co")
  }

  test("round-13: same-url items with DIFFERENT fields resolve to one " +
      "deterministic winner regardless of partition layout") {
    val u = "https://www.coindesk.com/markets-dup"
    val items = Seq(
      s"<item><title>Zed take</title><link>$u</link>" +
        "<pubDate>Tue, 02 Jan 2024 00:00:00 +0000</pubDate>" +
        "<category>Late</category></item>",
      s"<item><title>Alpha take</title><link>$u</link>" +
        "<pubDate>Mon, 01 Jan 2024 00:00:00 +0000</pubDate>" +
        "<category>Early</category></item>")
    val a = Rss.crawlFlow(items.toDF("xml")).collect()
    val b = Rss.crawlFlow(items.reverse.toDF("xml").repartition(7)).collect()
    assert(a.length == 1 && b.length == 1)
    assert(a.head == b.head, s"layout-dependent winner: ${a.head} vs ${b.head}")
    assert(a.head.getAs[String]("title") == "Alpha take") // earliest pubDate
  }

  test("round-13: RFC-822 named zones and unpadded days parse instead of " +
      "nulling (GMT is the WordPress feed default)") {
    val got = Seq(
      "Thu, 01 Jan 2024 00:00:00 GMT",
      "Wed, 2 Oct 2002 08:00:00 +0000",
      "Thu, 01 Jan 2024 00:00:00 EST",
      "not a date").toDF("d")
      .select(unix_timestamp(graft.sources.KafkaJson.parseRfc822(col("d"))))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got(0).contains(1704067200L))
    assert(got(1).contains(1033545600L))
    assert(got(2).contains(1704085200L)) // EST = UTC-5
    assert(got(3).isEmpty)
  }

  test("enrich attaches content + engine-side sentiment, empty content -> 0.0") {
    val arts = Rss.crawlFlow(RssQueries.itemFixtures.toDF("xml"))
    val contents = Seq(
      ("https://www.coindesk.com/markets-btc-tops-42k", "great gains and a strong rally"))
      .toDF("url", "content")
    val out = Rss.enrich(arts, contents).collect()
    val scored = out.map(r =>
      r.getAs[String]("url") -> r.getAs[Double]("sentiment_score")).toMap
    assert(scored("https://www.coindesk.com/markets-btc-tops-42k") > 0.5)
    assert(scored("https://www.newsbtc.com/analysis/eth-outlook") == 0.0)
  }

  test("kline sweep through a fixture fetcher lands in the warehouse shape") {
    val fx = new Ingest.FixtureFetcher(Map(
      ("BTCUSDT", "1h") -> graft.queries.WireQueries.priceFixtures.take(1),
      ("ETHUSDT", "1h") -> graft.queries.WireQueries.priceFixtures.slice(1, 2)))
    val klines = Ingest.sweep(spark, fx, Seq("BTCUSDT", "ETHUSDT"), Seq("1h"))
    assert(klines.count() == 2)

    val symDim = Seq((1, "BTCUSDT")).toDF("symbol_id", "symbol_name")
    val ivDim = spark.emptyDataFrame
      .sparkSession.createDataFrame(Seq.empty[(Int, String)])
      .toDF("interval_id", "interval_name")
    val wh = Ingest.toWarehouse(klines, symDim, ivDim)
    assert(wh.columns.toSeq == Seq("symbol_id", "interval_id", "open_price",
      "high_price", "low_price", "close_price", "volume", "open_time", "close_time"))
    // BTCUSDT keeps id 1; ETHUSDT gets a fresh surrogate; interval dim grows
    // from empty (ids are LONG: getOrCreate widens int dims, never wraps)
    val ids = wh.select("symbol_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
    assert(wh.select("interval_id").as[Long].collect().toSet == Set(1L))
  }

  test("scrape stage: paragraph extraction, failure fallback, column passthrough") {
    val articles = Seq(
      ("https://www.coindesk.com/markets-btc-tops-42k", "BTC Tops 42K"),
      ("https://www.newsbtc.com/analysis/eth-outlook", "ETH Outlook"))
      .toDF("url", "title")
    val out = graft.sources.Rss.scrape(articles, graft.sources.Rss.fixtureFetcher)
      .collect().map(r => r.getString(0) -> r).toMap
    // success row: paragraphs joined, non-<p> chrome dropped
    val ok = out("https://www.coindesk.com/markets-btc-tops-42k")
    assert(ok.getString(2) ==
      "markets btc tops 42k traders cheer strong gains and growth")
    assert(ok.getString(1) == "BTC Tops 42K") // other columns survive
    // failure row: content "" (reference try/except contract), not a crash
    assert(out("https://www.newsbtc.com/analysis/eth-outlook").getString(2) == "")
    // and "" scores sentiment 0.0 downstream
    assert(graft.operators.Sentiment.score("") == 0.0)
  }

  test("extractParagraphs strips nested tags and drops empty paragraphs") {
    val html = "<html><p>a <b>bold</b> claim</p><p>  </p><div>no</div><p>second</p></html>"
    assert(graft.sources.Rss.extractParagraphs(html) == "a bold claim second")
  }

  test("hashed-shingle jaccard equals string-shingle jaccard") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val hashed = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
      hashShingles = true).select("id_1", "id_2").as[(Long, Long)].collect().toSet
    val strings = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
      hashShingles = false).select("id_1", "id_2").as[(Long, Long)].collect().toSet
    assert(hashed == strings)
  }
}
