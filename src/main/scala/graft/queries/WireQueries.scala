package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.sources.KafkaJson

/** Wire-format parity queries: the Kafka JSON codecs, date parsing, and
  * explicit decimal casts (SURVEY.md §2.8 E8-E16). Inputs are literal captured
  * message fixtures (FIXTURES.md §A) — the oracle parses the SAME literals with
  * DuckDB's JSON/strptime machinery, so the check is a genuine reimplementation
  * comparison, not an echo.
  */
object WireQueries {

  /** Captured `crypto-prices` fixture messages (shape per
    * producer_prices.py:48-59): one clean, one missing `interval` (must
    * default to "1h"), one 1d kline, one with tiny decimals.
    */
  val priceFixtures: Seq[String] = Seq(
    """{"symbol":"BTCUSDT","interval":"1h","open_time":1704067200000,"open":"42283.58000000","high":"42554.57000000","low":"42261.02000000","close":"42475.23000000","volume":"1271.68108000","close_time":1704070799999,"fetched_at":"2024-01-01T01:00:05"}""",
    """{"symbol":"ETHUSDT","open_time":1704067200000,"open":"2282.91000000","high":"2302.31000000","low":"2280.00000000","close":"2294.84000000","volume":"41241.80550000","close_time":1704070799999,"fetched_at":"2024-01-01T01:00:05"}""",
    """{"symbol":"BTCUSDT","interval":"1d","open_time":1704067200000,"open":"42283.58000000","high":"42899.00000000","low":"41500.00000000","close":"42569.76000000","volume":"18943.70571000","close_time":1704153599999,"fetched_at":"2024-01-02T00:00:07"}""",
    """{"symbol":"DOGEUSDT","interval":"1h","open_time":1704067200000,"open":"0.08931000","high":"0.08977000","low":"0.08930000","close":"0.08958000","volume":"48181466.00000000","close_time":1704070799999,"fetched_at":"2024-01-01T01:00:05"}"""
  )

  /** Captured `crypto-news` fixtures (producer_news.py:76-83): null tag,
    * empty content with 0.0 sentiment, offsets in created_date.
    */
  val newsFixtures: Seq[String] = Seq(
    """{"title":"Bitcoin Tops 42K","url":"https://www.coindesk.com/markets-bitcoin-tops-42k","created_date":"2024-01-01 12:00:00+00:00","tag":"Markets","content":"Bitcoin rose above 42000 on Monday.","sentiment_score":0.4215}""",
    """{"title":"ETH Outlook","url":"https://www.newsbtc.com/analysis/eth-outlook","created_date":"2024-01-01 09:30:00+00:00","tag":null,"content":"","sentiment_score":0.0}""",
    """{"title":"Regulation Watch","url":"https://www.coindesk.com/policy-regulation-watch","created_date":"2023-12-31 23:45:10+00:00","tag":"Policy","content":"Regulators weigh new crypto rules; markets shrug.","sentiment_score":-0.128}"""
  )

  private def rawDf(s: SparkSession, fixtures: Seq[String]): DataFrame = {
    import s.implicits._
    fixtures.toDF("value")
  }

  /** Price-message decode (S4/E9 + the interval default E15 + epoch-ms→second
    * grain E8 + string→decimal casts). Decimals exposed at declared precision.
    */
  def parsePrices(s: SparkSession, dir: String): DataFrame =
    KafkaJson.parsePrices(rawDf(s, priceFixtures))
      .select(
        col("symbol"), col("interval"),
        unix_timestamp(col("open_time")).as("open_sec"),
        unix_timestamp(col("close_time")).as("close_sec"),
        // Decimals leave the gate as full-scale plain strings: Spark's
        // decimal->string and DuckDB's decimal->varchar render identically
        // ("42283.5800000000"), while decimal-typed columns are read back
        // asymmetrically by the comparer (Decimal objects vs float64).
        col("open_price").cast("string").as("open_price"),
        col("close_price").cast("string").as("close_price"),
        col("volume").cast("string").as("volume"))

  val parsePricesOracle: String =
    s"""WITH raw(value) AS (VALUES ${priceFixtures.map(f => "('" + f.replace("'", "''") + "')").mkString(", ")})
       |SELECT
       |  json_extract_string(value, '$$.symbol') AS symbol,
       |  COALESCE(json_extract_string(value, '$$.interval'), '1h') AS interval,
       |  CAST(json_extract_string(value, '$$.open_time') AS BIGINT) // 1000 AS open_sec,
       |  CAST(json_extract_string(value, '$$.close_time') AS BIGINT) // 1000 AS close_sec,
       |  CAST(CAST(json_extract_string(value, '$$.open') AS DECIMAL(20,10)) AS VARCHAR) AS open_price,
       |  CAST(CAST(json_extract_string(value, '$$.close') AS DECIMAL(20,10)) AS VARCHAR) AS close_price,
       |  CAST(CAST(json_extract_string(value, '$$.volume') AS DECIMAL(38,18)) AS VARCHAR) AS volume
       |FROM raw""".stripMargin

  /** News-message decode (S5/E9): nullable tag, tz-offset timestamps. */
  def parseNews(s: SparkSession, dir: String): DataFrame =
    KafkaJson.parseNews(rawDf(s, newsFixtures))
      .select(
        col("title"), col("url"),
        unix_timestamp(col("created_date")).as("created_sec"),
        col("tag"), col("content"), col("sentiment_score"))

  val parseNewsOracle: String =
    s"""WITH raw(value) AS (VALUES ${newsFixtures.map(f => "('" + f.replace("'", "''") + "')").mkString(", ")})
       |SELECT
       |  json_extract_string(value, '$$.title') AS title,
       |  json_extract_string(value, '$$.url') AS url,
       |  epoch_us(CAST(json_extract_string(value, '$$.created_date') AS TIMESTAMPTZ)) // 1000000 AS created_sec,
       |  json_extract_string(value, '$$.tag') AS tag,
       |  json_extract_string(value, '$$.content') AS content,
       |  CAST(json_extract(value, '$$.sentiment_score') AS DOUBLE) AS sentiment_score
       |FROM raw""".stripMargin

  /** RFC-822 pubDate parsing (E11, producer_news.py:61) across tz offsets,
    * named zones and unpadded days (round-13 widening: the strict
    * offset-only pattern nulled the GMT/unpadded forms real feeds emit). */
  val rfc822Fixtures: Seq[String] = Seq(
    "Mon, 01 Jan 2024 12:30:45 +0000",
    "Sun, 31 Dec 2023 23:59:59 -0500",
    "Tue, 02 Jan 2024 08:15:00 +0700",
    "Mon, 15 Jul 2024 00:00:01 +0000",
    "Thu, 01 Jan 2024 00:00:00 GMT", // WordPress-default named zone
    "Wed, 2 Oct 2002 08:00:00 +0000", // RFC-822 1*2DIGIT day
    "Thu, 01 Jan 2024 00:00:00 EST")

  def rfc822Parse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rfc822Fixtures.toDF("pub_date")
      .select(col("pub_date"),
        unix_timestamp(KafkaJson.parseRfc822(col("pub_date"))).as("pub_sec"))
  }

  val rfc822Oracle: String =
    s"""WITH raw(pub_date) AS (VALUES ${rfc822Fixtures.map("('" + _ + "')").mkString(", ")})
       |SELECT pub_date,
       |  epoch_us(coalesce(
       |    try_strptime(pub_date, '%a, %d %b %Y %H:%M:%S %z'),
       |    try_strptime(pub_date, '%a, %d %b %Y %H:%M:%S %Z'))) // 1000000
       |    AS pub_sec
       |FROM raw""".stripMargin

  /** Explicit string→decimal casting (E8/§1.2: Binance sends prices as
    * strings; the cast must be engine-side and lossless at declared scale).
    */
  val decimalFixtures: Seq[String] =
    Seq("42283.58", "0.0893100001", "1.5", "99999999.9999999999", "0.0000000001")

  def decimalCast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decimalFixtures.toDF("raw")
      .select(col("raw"),
        // Full-scale plain-string rendering on both sides (see parsePrices):
        // the string IS the losslessness witness — every digit of the
        // declared scale survives the cast or the hashes diverge.
        col("raw").cast(Schemas.priceDecimal).cast("string").as("price"),
        col("raw").cast(Schemas.volumeDecimal).cast("string").as("vol"))
  }

  val decimalCastOracle: String =
    s"""WITH raw(raw) AS (VALUES ${decimalFixtures.map("('" + _ + "')").mkString(", ")})
       |SELECT raw,
       |  CAST(CAST(raw AS DECIMAL(20,10)) AS VARCHAR) AS price,
       |  CAST(CAST(raw AS DECIMAL(38,18)) AS VARCHAR) AS vol
       |FROM raw""".stripMargin

  /** Exact dedup by content fingerprint (md5) — T3's dedup-on-write key,
    * and the first rung of the dedup ladder (north star).
    */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  val exactDedupOracle: String =
    """SELECT md5(text) AS fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin
}
