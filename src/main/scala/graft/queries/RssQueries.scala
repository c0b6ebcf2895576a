package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Rss

/** RSS crawl parity query (S2/E16/P6/P7): Spark parses real XML with
  * from_xml + namespaced xpath; the oracle re-extracts the same fields from
  * the same literals with regexes — independent implementations, equal
  * output. The duplicated item is byte-identical so the dedup survivor is
  * deterministic on both sides.
  */
object RssQueries {

  val itemFixtures: Seq[String] = Seq(
    """<item><title>BTC Tops 42K</title><link>https://www.coindesk.com/markets-btc-tops-42k</link><pubDate>Mon, 01 Jan 2024 12:30:45 +0000</pubDate><category>Markets</category></item>""",
    """<item><title>ETH Outlook 2024</title><link>https://www.newsbtc.com/analysis/eth-outlook</link><pubDate>Sun, 31 Dec 2023 23:59:59 -0500</pubDate><dc:creator xmlns:dc="http://purl.org/dc/elements/1.1/">alice</dc:creator></item>""",
    """<item><title>Spam</title><link>https://evil.example.com/markets-x</link><pubDate>Mon, 01 Jan 2024 00:00:00 +0000</pubDate><category>Spam</category></item>""",
    """<item><title>BTC Tops 42K</title><link>https://www.coindesk.com/markets-btc-tops-42k</link><pubDate>Mon, 01 Jan 2024 12:30:45 +0000</pubDate><category>Markets</category></item>""",
    """<item><title>SOL Slides</title><link>https://www.coindesk.com/markets-sol-slides</link><pubDate>Tue, 02 Jan 2024 08:15:00 +0000</pubDate><category>Markets</category></item>"""
  )

  def rssParse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Rss.crawlFlow(itemFixtures.toDF("xml"))
      .select(col("title"), col("url"),
        unix_timestamp(col("created_date")).as("created_sec"), col("tag"))
  }

  val rssParseOracle: String = {
    val vals = itemFixtures.map(f => "('" + f.replace("'", "''") + "')").mkString(", ")
    s"""WITH raw(xml) AS (VALUES $vals),
       |parsed AS (
       |  SELECT
       |    regexp_extract(xml, '<title>(.*?)</title>', 1) AS title,
       |    regexp_extract(xml, '<link>(.*?)</link>', 1) AS url,
       |    epoch_us(strptime(regexp_extract(xml, '<pubDate>(.*?)</pubDate>', 1),
       |                      '%a, %d %b %Y %H:%M:%S %z')) // 1000000 AS created_sec,
       |    COALESCE(
       |      NULLIF(regexp_extract(xml, '<category>(.*?)</category>', 1), ''),
       |      NULLIF(regexp_extract(xml, '<dc:creator[^>]*>(.*?)</dc:creator>', 1), '')
       |    ) AS tag
       |  FROM raw
       |)
       |SELECT DISTINCT title, url, created_sec, tag FROM parsed
       |WHERE regexp_matches(url, '^https://www\\.coindesk\\.com/[a-z0-9-]+')
       |   OR regexp_matches(url, '^https://www\\.newsbtc\\.com/[a-z0-9-/]+')""".stripMargin
  }

  /** S3 end-to-end: RSS parse -> whitelist/dedup -> DISTRIBUTED scrape
    * (mapPartitions + per-row failure fallback) -> sentiment. The fixture
    * fetcher derives html from the url and throws for newsbtc.com, so the
    * oracle reconstructs each row's content (and the failed row's "" ->
    * 0.0 score) from the same literals. The fixture contents are built
    * from plain lowercase lexicon words — no boosters/caps/punctuation —
    * so the oracle scores them with the bare lexicon-sum normalization;
    * the full rule chain is gated separately by q_sentiment.
    */
  def scrapeSentiment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val articles = Rss.crawlFlow(itemFixtures.toDF("xml"))
      .select("url", "title")
    Rss.scrape(articles, Rss.fixtureFetcher)
      .select(col("url"), col("content"),
        round(graft.operators.Sentiment.active.sentiment(col("content")), 6)
          .as("sentiment_score"))
  }

  val scrapeSentimentOracle: String = {
    val vals = itemFixtures.map(f => "('" + f.replace("'", "''") + "')").mkString(", ")
    // the ACTIVE scorer's lexicon (same maps the query scored with), so the
    // gate stays in sync if a full lexicon file is configured
    val lexVals = graft.operators.Sentiment.active.lexicon.toSeq.sorted
      .map { case (w, v) => s"('${w.replace("'", "''")}', CAST($v AS DOUBLE))" }
      .mkString(", ")
    s"""WITH lex(word, val) AS (VALUES $lexVals),
       |raw(xml) AS (VALUES $vals),
       |parsed AS (
       |  SELECT DISTINCT regexp_extract(xml, '<link>(.*?)</link>', 1) AS url
       |  FROM raw
       |),
       |arts AS (
       |  SELECT url FROM parsed
       |  WHERE regexp_matches(url, '^https://www\\.coindesk\\.com/[a-z0-9-]+')
       |     OR regexp_matches(url, '^https://www\\.newsbtc\\.com/[a-z0-9-/]+')
       |),
       |scraped AS (
       |  SELECT url,
       |    CASE WHEN url LIKE '%newsbtc.com%' THEN ''
       |         ELSE replace(regexp_extract(url, '([^/]*)$$', 1), '-', ' ')
       |           || ' ' ||
       |           CASE WHEN url LIKE '%btc%'
       |                THEN 'traders cheer strong gains and growth'
       |                ELSE 'panic and fear as losses mount' END
       |    END AS content
       |  FROM arts
       |),
       |toks AS (
       |  SELECT url, content, unnest(string_split(content, ' ')) AS w
       |  FROM scraped
       |),
       |sums AS (
       |  SELECT t.url, t.content, COALESCE(SUM(lex.val), 0.0) AS sv
       |  FROM toks t LEFT JOIN lex ON lex.word = t.w
       |  GROUP BY t.url, t.content
       |)
       |SELECT url, content,
       |  CASE WHEN content = '' THEN 0.0
       |       ELSE ROUND(GREATEST(-1.0, LEAST(1.0, sv / sqrt(sv * sv + 15.0))), 6)
       |  END AS sentiment_score
       |FROM sums""".stripMargin
  }
}
