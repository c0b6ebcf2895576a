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
