package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Schemas

/** Ingestion seams for the reference's pull-based sources (S1 Binance REST,
  * S3 article scrape) and the JDBC warehouse boundary (S6/K3-K5).
  *
  * The fetch side is a trait so the zero-egress build substitutes captured
  * fixtures for live HTTP: production wires a real client (driver-side for
  * the 16-key kline sweep — it is TINY; a custom DataSourceV2 only pays off
  * when the key space explodes), tests/CI replay fixtures byte-for-byte.
  */
object Ingest {

  /** S1: one kline sweep = rows of raw JSON messages (the producer's wire
    * shape, producer_prices.py:48-59). Implementations must be deterministic
    * per (symbol, interval, limit) for replay.
    */
  trait KlineFetcher {
    def fetch(symbol: String, interval: String, limit: Int): Seq[String]
  }

  /** Fixture-backed fetcher (captured messages), the test/CI implementation. */
  final class FixtureFetcher(fixtures: Map[(String, String), Seq[String]]) extends KlineFetcher {
    def fetch(symbol: String, interval: String, limit: Int): Seq[String] =
      fixtures.getOrElse((symbol, interval), Seq.empty).take(limit)
  }

  /** Sweep all (symbol, interval) pairs into a typed kline DataFrame —
    * the producer loop (producer_prices.py:29-66) as one engine call.
    */
  def sweep(
      spark: SparkSession,
      fetcher: KlineFetcher,
      symbols: Seq[String],
      intervals: Seq[String],
      limit: Int = 1000): DataFrame = {
    import spark.implicits._
    val raw = for {
      s <- symbols; i <- intervals; msg <- fetcher.fetch(s, i, limit)
    } yield msg
    KafkaJson.parsePrices(raw.toDF("value"))
  }

  // --- JDBC warehouse boundary (S6/K5) ---------------------------------------
  // Compile-only in this image (no MySQL); the options mirror the reference's
  // connection shape (spark_job_1.py:18-22, 88-96). Tests substitute parquet.

  def jdbcRead(spark: SparkSession, url: String, table: String,
      user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .load()

  def jdbcAppend(df: DataFrame, url: String, table: String,
      user: String, password: String): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .mode("append")
      .save()

  /** The reference's full kline backfill shape: 8 symbols x 2 intervals
    * (producer_prices.py:17-19).
    */
  val referenceSymbols: Seq[String] = Seq("BTCUSDT", "ETHUSDT", "BNBUSDT",
    "XRPUSDT", "ADAUSDT", "DOGEUSDT", "SOLUSDT", "DOTUSDT")
  val referenceIntervals: Seq[String] = Seq("1h", "1d")

  /** Convenience: star-schema projection of a kline sweep, resolved against
    * engine-managed dims (symbol, interval) — the consumer's get_or_create
    * (J4) at ingest.
    */
  def toWarehouse(klines: DataFrame, symbolDim: DataFrame, intervalDim: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val (withSym, _) = graft.operators.Joins.resolveDim(
      klines.withColumnRenamed("symbol", "symbol_name"), symbolDim, "symbol_id", "symbol_name")
    val (withBoth, _) = graft.operators.Joins.resolveDim(
      withSym.withColumnRenamed("interval", "interval_name"), intervalDim, "interval_id", "interval_name")
    withBoth.select(
      col("symbol_id"), col("interval_id"),
      col("open_price"), col("high_price"), col("low_price"), col("close_price"),
      col("volume"), col("open_time"), col("close_time"))
  }
}
