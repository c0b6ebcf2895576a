package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for every data shape the engine touches.
  *
  * Mirrors the reference's three data layers (SURVEY.md §1): the Kafka JSON wire
  * messages (reference: dags/producer_prices.py:48-59, dags/producer_news.py:76-83),
  * the MySQL star schema (reference: the datawarehouse DDL files), and the analytic
  * time-series shape consumed by the indicator job (reference: dags/spark_job_1.py:22).
  *
  * Schemas are always declared, never inferred — the reference's main bug class is
  * silent producer/consumer schema drift (prices as strings, optional `interval`).
  */
object Schemas {

  // ---------------------------------------------------------------------------
  // Kafka wire schemas (schema-on-read for from_json)
  // ---------------------------------------------------------------------------

  /** `crypto-prices` message value. Binance returns prices as decimal STRINGS
    * (reference: dags/producer_prices.py:51-56); the cast to decimal is explicit
    * and happens in [[graft.sources.KafkaJson.parsePrices]], not silently at a sink.
    * `open_time`/`close_time` are epoch milliseconds.
    */
  val priceMessage: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("interval", StringType, nullable = true), // missing => default "1h" (consumer_prices.py:63)
    StructField("open_time", LongType, nullable = false),
    StructField("open", StringType, nullable = true),
    StructField("high", StringType, nullable = true),
    StructField("low", StringType, nullable = true),
    StructField("close", StringType, nullable = true),
    StructField("volume", StringType, nullable = true),
    StructField("close_time", LongType, nullable = false),
    StructField("fetched_at", StringType, nullable = true)
  ))

  /** `crypto-news` message value (reference: dags/producer_news.py:76-83).
    * `tag` is nullable (category/dc:creator fallback can both be absent);
    * `content` may be "" on scrape failure, with sentiment_score 0.0.
    */
  val newsMessage: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("url", StringType, nullable = false),
    StructField("created_date", StringType, nullable = true),
    StructField("tag", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("sentiment_score", DoubleType, nullable = true)
  ))

  // ---------------------------------------------------------------------------
  // Warehouse star schema (reference: datawarehouse/kline_dim_fact.sql,
  // indicator_dim_fact.sql, news_dim_fact.sql — see SURVEY.md §1.4)
  // ---------------------------------------------------------------------------

  val priceDecimal: DecimalType = DecimalType(20, 10)  // kline_dim_fact.sql:15-18
  val volumeDecimal: DecimalType = DecimalType(38, 18) // kline_dim_fact.sql:19
  val indicatorDecimal: DecimalType = DecimalType(18, 8) // indicator_dim_fact.sql:16

  val symbolDim: StructType = StructType(Seq(
    StructField("symbol_id", IntegerType, nullable = false),
    StructField("symbol_name", StringType, nullable = false)
  ))

  val intervalDim: StructType = StructType(Seq(
    StructField("interval_id", IntegerType, nullable = false),
    StructField("interval_name", StringType, nullable = false)
  ))

  /** Timestamps are second-grain (MySQL DATETIME equivalence) — see SURVEY.md §7.4
    * hard part 2: normalizing at ingest keeps the idempotence anti-join keys stable.
    */
  val klineFact: StructType = StructType(Seq(
    StructField("kline_id", LongType, nullable = false),
    StructField("symbol_id", IntegerType, nullable = false),
    StructField("interval_id", IntegerType, nullable = false),
    StructField("open_price", priceDecimal, nullable = true),
    StructField("high_price", priceDecimal, nullable = true),
    StructField("low_price", priceDecimal, nullable = true),
    StructField("close_price", priceDecimal, nullable = true),
    StructField("volume", volumeDecimal, nullable = true),
    StructField("open_time", TimestampType, nullable = false),
    StructField("close_time", TimestampType, nullable = false)
  ))

  val indicatorTypeDim: StructType = StructType(Seq(
    StructField("type_id", IntegerType, nullable = false),
    StructField("type_name", StringType, nullable = false)
  ))

  /** Seed rows, exactly as the reference seeds them (indicator_dim_fact.sql:7-8). */
  val indicatorTypeSeed: Seq[(Int, String)] =
    Seq((1, "SMA"), (2, "RSI"), (3, "BB_UP"), (4, "BB_DOWN"))

  val indicatorFact: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("symbol_id", IntegerType, nullable = false),
    StructField("interval_id", IntegerType, nullable = false),
    StructField("type_id", IntegerType, nullable = false),
    StructField("value", indicatorDecimal, nullable = true),
    StructField("timestamp", TimestampType, nullable = false)
  ))

  val tagDim: StructType = StructType(Seq(
    StructField("tag_id", IntegerType, nullable = false),
    StructField("tag_name", StringType, nullable = false)
  ))

  val newsFact: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("url", StringType, nullable = false),
    StructField("sentiment_score", FloatType, nullable = true),
    StructField("created_date", TimestampType, nullable = true),
    StructField("view_number", IntegerType, nullable = true),
    StructField("tag_id", IntegerType, nullable = true)
  ))
}

// Round-13 note: the former Kline/NewsArticle/Indicator "typed Dataset
// counterparts" were deleted — referenced nowhere in main or test code,
// and already drifted from the StructTypes above (Kline omitted kline_id
// and keyed by strings where klineFact uses surrogate ints; Indicator
// declared a non-nullable Double against indicatorFact's nullable
// DECIMAL). Unused and unasserted, the drift could only grow; the typed
// surfaces the engine actually ships (KlinePoint, SessionRow, TotalsRow,
// DecodedFeatures) live next to their operators where their specs pin
// them.
