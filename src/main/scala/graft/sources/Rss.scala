package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Sentiment

/** RSS item extraction (reference S2/E16, producer_news.py:39-63): parse
  * `<item>` XML into (url, title, pubDate ts, tag) with the reference's
  * category -> dc:creator fallback, URL whitelist, and dedup. XML parsing is
  * Spark-native from_xml; the namespaced dc:creator needs an xpath
  * local-name() match (from_xml drops namespaced fields).
  */
object Rss {

  val itemSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("link", StringType),
    StructField("pubDate", StringType),
    StructField("category", StringType)))

  /** Parse raw `<item>` XML strings into the news-article shape. Mirrors
    * producer_news.py:54-63: RFC-822 pubDate, category with dc:creator
    * fallback (E16), null tag allowed.
    *
    * The namespaced dc:creator is extracted with a regex rather than
    * xpath_string: Spark's xpath_* functions THROW (a misleading "Error
    * loading expression" RuntimeException) when a row's XML is malformed,
    * which is unacceptable for untrusted feed content; from_xml and
    * regexp_extract both degrade to null instead.
    */
  def parseItems(raw: DataFrame, xmlCol: String = "xml"): DataFrame =
    raw
      .withColumn("m", from_xml(col(xmlCol), itemSchema))
      // round-13 hardening of the creator fallback, matching what from_xml
      // gives the category path: (?s) so multi-line creators match at all,
      // CDATA unwrapped, the XML entities a text node can carry decoded
      // (feedparser hands the reference DECODED text — without this the
      // same author appears as both "Smith & Co" and "Smith &amp; Co"),
      // then trimmed; whitespace-only creators stay NULL
      .withColumn("_creator_raw",
        regexp_extract(col(xmlCol),
          "(?s)<dc:creator[^>]*>(.*?)</dc:creator>", 1))
      .withColumn("_creator_txt", trim(regexp_replace(
        col("_creator_raw"), "(?s)^\\s*<!\\[CDATA\\[(.*?)\\]\\]>\\s*$", "$1")))
      .withColumn("creator", nullif(
        Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
            "&apos;" -> "'", "&#39;" -> "'", "&amp;" -> "&")
          .foldLeft(col("_creator_txt")) { case (c, (e, ch)) =>
            regexp_replace(c, e, java.util.regex.Matcher.quoteReplacement(ch))
          }, lit("")))
      .select(
        col("m.title").as("title"),
        col("m.link").as("url"),
        KafkaJson.parseRfc822(col("m.pubDate")).as("created_date"),
        coalesce(col("m.category"), col("creator")).as("tag"))

  /** Full crawl-side transform (S2+P6+P7): parse, whitelist, dedup by URL.
    * The per-URL winner is DETERMINISTIC (round-13 fix): dropDuplicates
    * keeps an arbitrary row, so a url appearing twice with different
    * title/pubDate/tag (category in one sweep, dc:creator fallback in
    * another) flipped values between runs. min_by over the full remaining
    * tuple pins one winner regardless of partition layout — the functional
    * analogue of the reference's first-seen-wins set.
    */
  def crawlFlow(raw: DataFrame, xmlCol: String = "xml"): DataFrame =
    parseItems(raw, xmlCol)
      .filter(col("url").isNotNull && KafkaJson.validNewsUrl(col("url")))
      .groupBy(col("url"))
      .agg(min_by(struct(col("title"), col("created_date"), col("tag")),
        struct(col("created_date"), col("title"), col("tag"))).as("_w"))
      .select(col("_w.title").as("title"), col("url"),
        col("_w.created_date").as("created_date"), col("_w.tag").as("tag"))

  /** Article enrichment (S3+F1): attach scraped content and engine-side
    * sentiment. `contentLookup` stands in for the distributed fetch (a
    * mapPartitions HTTP stage in production — zero-egress here); joining a
    * content table exercises the same plan shape.
    */
  def enrich(articles: DataFrame, contents: DataFrame): DataFrame =
    articles
      .join(contents, Seq("url"), "left")
      .withColumn("content", coalesce(col("content"), lit("")))
      .withColumn("sentiment_score", Sentiment.active.sentiment(col("content")))

  // --- distributed scrape stage (S3) ----------------------------------------

  private val PTag = "(?s)<p[^>]*>(.*?)</p>".r

  /** Paragraph extraction mirroring producer_news.py:68-70 (BeautifulSoup
    * `find_all("p")`, per-paragraph text strip, single-space join): every
    * `<p>` body with inner tags removed, empties dropped.
    */
  def extractParagraphs(html: String): String =
    PTag.findAllMatchIn(html)
      .map(_.group(1).replaceAll("<[^>]*>", "").trim)
      .filter(_.nonEmpty)
      .mkString(" ")

  /** S3: the distributed article-body fetch, shaped exactly like the
    * reference's crawl loop (producer_news.py:66-74) but as a
    * `mapPartitions` enrichment stage: each partition fetches its rows
    * through `fetcher`, extracts paragraph text, and on ANY per-row failure
    * falls back to content = "" (which downstream scores sentiment 0.0 —
    * the reference's try/except contract). The fetcher is a plain
    * serializable function so production swaps in an HTTP client (with
    * per-partition connection reuse) and tests use [[fixtureFetcher]];
    * failures never kill the task, so one dead article site can't fail a
    * 100 TB crawl batch.
    */
  def scrape(articles: DataFrame, fetcher: String => String,
      urlCol: String = "url"): DataFrame = {
    val schema = articles.schema.add("content", StringType)
    articles.mapPartitions { rows =>
      rows.map { r =>
        val content =
          try extractParagraphs(fetcher(r.getAs[String](urlCol)))
          catch { case scala.util.control.NonFatal(_) => "" }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ content)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Deterministic stand-in for the HTTP fetch (zero-egress sandbox): the
    * html derives purely from the url — slug words plus a mood paragraph —
    * and newsbtc.com urls throw to exercise the failure fallback. The SQL
    * oracle reconstructs the identical content per url.
    */
  val fixtureFetcher: String => String = url => {
    if (url.contains("newsbtc.com"))
      throw new RuntimeException(s"fetch failed: $url")
    val slug = url.substring(url.lastIndexOf('/') + 1).replace('-', ' ')
    val mood =
      if (url.contains("btc")) "traders cheer strong gains and growth"
      else "panic and fear as losses mount"
    s"<html><body><div><p>$slug</p><span>nav chrome</span><p>$mood</p></div></body></html>"
  }
}
