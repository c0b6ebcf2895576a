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
    """<item><title>BTC Tops 42K</title><link>https://www.coindesk.com/markets-btc-tops-42k</link><pubDate>Mon, 01 Jan 2024 12:30:45 +0000</pubDate><category>Markets</category></item>"""
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
}
