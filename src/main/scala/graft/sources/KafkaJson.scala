package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Wire-format codecs for the two Kafka topics (SURVEY.md §2.1/§2.2, E9/E10).
  *
  * Works on any DataFrame with a binary-or-string `value` column (and
  * optionally `key`) — i.e. both `spark.readStream.format("kafka")` output and
  * batch fixtures of captured JSON lines. All casts the reference performs
  * implicitly at sink boundaries are made explicit here:
  *   - Binance price/volume strings -> DecimalType (producer_prices.py:51-56
  *     forwards strings; MySQL coerced on insert — we cast at ingest);
  *   - epoch-ms open/close_time -> second-grain TimestampType (consumer_prices
  *     .py:76-77; second grain per SURVEY.md §7.4 hard part 2 so idempotence
  *     keys round-trip through any sink);
  *   - missing `interval` -> "1h" (consumer_prices.py:63);
  *   - ISO-8601 / RFC-822 date strings -> TimestampType.
  */
object KafkaJson {

  /** Truncate an epoch-millis column to a second-grain timestamp. */
  private def msToSecondGrain(c: Column): Column =
    timestamp_seconds(c.cast("long") / lit(1000) cast "long")

  /** Parse `crypto-prices` messages: value JSON (+ key "SYMBOL-interval")
    * into typed kline rows (reference producer_prices.py:48-64).
    */
  def parsePrices(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), Schemas.priceMessage).as("m"))
      .select(
        col("m.symbol").as("symbol"),
        coalesce(col("m.interval"), lit("1h")).as("interval"),
        msToSecondGrain(col("m.open_time")).as("open_time"),
        col("m.open").cast(Schemas.priceDecimal).as("open_price"),
        col("m.high").cast(Schemas.priceDecimal).as("high_price"),
        col("m.low").cast(Schemas.priceDecimal).as("low_price"),
        col("m.close").cast(Schemas.priceDecimal).as("close_price"),
        col("m.volume").cast(Schemas.volumeDecimal).as("volume"),
        msToSecondGrain(col("m.close_time")).as("close_time"),
        try_to_timestamp(col("m.fetched_at")).as("fetched_at"))

  /** Serialize kline rows back to the wire shape: JSON value + "SYMBOL-interval"
    * key (reference producer_prices.py:62-64, E10). Inverse of [[parsePrices]]
    * modulo the decimal/timestamp normalization.
    */
  def toPriceMessages(klines: DataFrame): DataFrame =
    klines.select(
      concat_ws("-", col("symbol"), col("interval")).cast("binary").as("key"),
      to_json(struct(
        col("symbol"), col("interval"),
        unix_millis(col("open_time")).as("open_time"),
        col("open_price").cast("string").as("open"),
        col("high_price").cast("string").as("high"),
        col("low_price").cast("string").as("low"),
        col("close_price").cast("string").as("close"),
        col("volume").cast("string").as("volume"),
        unix_millis(col("close_time")).as("close_time"),
        date_format(col("fetched_at"), "yyyy-MM-dd'T'HH:mm:ss").as("fetched_at")
      )).cast("binary").as("value"))

  /** RFC-822 pubDate parsing as done by the reference (producer_news.py:61,
    * E11). Spark >= 3's parser cannot PARSE day-of-week text ('EEE'), so the
    * redundant "Mon, " prefix is stripped before to_timestamp.
    *
    * Round-13 widening: real feeds emit BOTH numeric offsets and named
    * zones, and RFC-822 allows 1*2DIGIT days. 'd' (not 'dd') accepts
    * unpadded days; the numeric-offset pattern ('Z') and the zone-name
    * pattern ('zzz' — GMT/UT/EST etc.) are tried in turn, since one
    * pattern cannot parse both shapes. The old single strict pattern
    * nulled "Thu, 01 Jan 2024 00:00:00 GMT" — a WordPress-default form —
    * silently dropping the article from every time-bucketed query.
    */
  val Rfc822: String = "d MMM yyyy HH:mm:ss Z"
  val Rfc822NamedZone: String = "d MMM yyyy HH:mm:ss zzz"

  def parseRfc822(c: Column): Column = {
    val stripped = regexp_replace(c, "^[A-Za-z]{3}, ", "")
    coalesce(
      try_to_timestamp(stripped, lit(Rfc822)),
      try_to_timestamp(stripped, lit(Rfc822NamedZone)))
  }

  /** Parse `crypto-news` messages (reference producer_news.py:76-85).
    * `created_date` arrives as a stringified tz-aware datetime
    * ("2024-01-01 12:00:00+00:00"); tag stays nullable.
    */
  def parseNews(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), Schemas.newsMessage).as("m"))
      .select(
        col("m.title").as("title"),
        col("m.url").as("url"),
        try_to_timestamp(col("m.created_date")).as("created_date"),
        col("m.tag").as("tag"),
        col("m.content").as("content"),
        col("m.sentiment_score").cast("double").as("sentiment_score"))

  def toNewsMessages(news: DataFrame): DataFrame =
    news.select(
      to_json(struct(
        col("title"), col("url"),
        date_format(col("created_date"), "yyyy-MM-dd HH:mm:ssxxx").as("created_date"),
        col("tag"), col("content"), col("sentiment_score")
      )).cast("binary").as("value"))

  /** URL-validity predicates from the reference's feed whitelist
    * (producer_news.py:29-36, P6).
    */
  val coindeskUrl: Column => Column = c => c.rlike("^https://www\\.coindesk\\.com/[a-z0-9-]+")
  val newsbtcUrl: Column => Column = c => c.rlike("^https://www\\.newsbtc\\.com/[a-z0-9-/]+")
  def validNewsUrl(c: Column): Column = coindeskUrl(c) || newsbtcUrl(c)
}
