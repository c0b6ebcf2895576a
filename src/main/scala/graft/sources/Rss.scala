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
      .withColumn("creator",
        nullif(regexp_extract(col(xmlCol),
          "<dc:creator[^>]*>(.*?)</dc:creator>", 1), lit("")))
      .select(
        col("m.title").as("title"),
        col("m.link").as("url"),
        KafkaJson.parseRfc822(col("m.pubDate")).as("created_date"),
        coalesce(col("m.category"), col("creator")).as("tag"))

  /** Full crawl-side transform (S2+P6+P7): parse, whitelist, dedup by URL. */
  def crawlFlow(raw: DataFrame, xmlCol: String = "xml"): DataFrame =
    parseItems(raw, xmlCol)
      .filter(col("url").isNotNull && KafkaJson.validNewsUrl(col("url")))
      .dropDuplicates("url")

  /** Article enrichment (S3+F1): attach scraped content and engine-side
    * sentiment. `contentLookup` stands in for the distributed fetch (a
    * mapPartitions HTTP stage in production — zero-egress here); joining a
    * content table exercises the same plan shape.
    */
  def enrich(articles: DataFrame, contents: DataFrame): DataFrame =
    articles
      .join(contents, Seq("url"), "left")
      .withColumn("content", coalesce(col("content"), lit("")))
      .withColumn("sentiment_score", Sentiment.sentiment(col("content")))
}
