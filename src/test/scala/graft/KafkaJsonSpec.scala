package graft

import org.apache.spark.sql.functions._

import graft.queries.WireQueries
import graft.sources.KafkaJson

class KafkaJsonSpec extends SparkTestBase {
  import spark.implicits._

  test("parsePrices: interval defaults to 1h when absent (consumer_prices.py:63)") {
    val out = KafkaJson.parsePrices(WireQueries.priceFixtures.toDF("value"))
    val eth = out.filter($"symbol" === "ETHUSDT").select("interval").as[String].head()
    assert(eth == "1h")
  }

  test("parsePrices: string prices become exact decimals, epoch-ms becomes second grain") {
    val out = KafkaJson.parsePrices(WireQueries.priceFixtures.toDF("value"))
    val doge = out.filter($"symbol" === "DOGEUSDT").head()
    assert(doge.getDecimal(doge.fieldIndex("close_price")).toPlainString == "0.0895800000")
    // close_time 1704070799999 ms -> truncated to 1704070799 s
    val closeSec = out.filter($"symbol" === "DOGEUSDT")
      .select(unix_timestamp($"close_time")).as[Long].head()
    assert(closeSec == 1704070799L)
  }

  test("price wire round-trip: parse(serialize(parse(x))) == parse(x)") {
    val once = KafkaJson.parsePrices(WireQueries.priceFixtures.toDF("value"))
    val twice = KafkaJson.parsePrices(KafkaJson.toPriceMessages(once))
    val a = once.orderBy("symbol", "interval").collect().map(_.toString).toSeq
    val b = twice.orderBy("symbol", "interval").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("toPriceMessages keys are SYMBOL-interval utf8 (producer_prices.py:63)") {
    val once = KafkaJson.parsePrices(WireQueries.priceFixtures.toDF("value"))
    val keys = KafkaJson.toPriceMessages(once)
      .select($"key".cast("string")).as[String].collect().toSet
    assert(keys == Set("BTCUSDT-1h", "ETHUSDT-1h", "BTCUSDT-1d", "DOGEUSDT-1h"))
  }

  test("parseNews: nullable tag survives, empty content allowed") {
    val out = KafkaJson.parseNews(WireQueries.newsFixtures.toDF("value"))
    val eth = out.filter($"url".contains("newsbtc")).head()
    assert(eth.isNullAt(eth.fieldIndex("tag")))
    assert(eth.getString(eth.fieldIndex("content")) == "")
    assert(eth.getDouble(eth.fieldIndex("sentiment_score")) == 0.0)
  }

  test("news URL whitelist regex (producer_news.py:29-36)") {
    val urls = Seq(
      ("https://www.coindesk.com/markets-abc", true),
      ("https://www.newsbtc.com/analysis/eth", true),
      ("https://evil.example.com/markets-abc", false),
      ("http://www.coindesk.com/markets-abc", false), // http not whitelisted
      ("https://www.coindesk.com/", false) // needs a slug
    ).toDF("url", "expected")
    val got = urls.withColumn("ok", KafkaJson.validNewsUrl(col("url")))
      .filter($"ok" =!= $"expected").count()
    assert(got == 0)
  }
}
