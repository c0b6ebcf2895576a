package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.IndicatorJob
import graft.sources.{Ingest, KafkaJson}

/** The whole reference pipeline as ONE gated query: captured wire JSON ->
  * explicit-schema decode (interval default, decimal casts, second-grain
  * times) -> surrogate-key dim resolution -> single-pass indicator window ->
  * long shape -> null filter -> type-dim join -> declared-precision values.
  * The oracle recomputes every stage in SQL from the same literals — if any
  * seam between the verified pieces is wrong, this query catches it.
  *
  * A reference user's entire spark_job_1.py + consumer path, in one call.
  */
object PipelineE2E {

  private val symbols = Seq("BTCUSDT", "ETHUSDT")
  private val intervals = Seq("1h", "1d")
  private val baseMs = 1704067200000L // 2024-01-01 00:00:00 UTC
  private val nPerSeries = 40

  /** Deterministic synthetic price path, 2-decimal strings like the wire. */
  private def price(s: Int, iv: Int, i: Int): String = {
    val v = 100.0 + s * 50 + iv * 7 +
      math.sin(i * 0.9 + s) * 12 + (i % 7) * 0.83 + i * 0.21
    f"${math.rint(v * 100) / 100}%.2f"
  }

  /** Captured-shape messages; every 5th message omits `interval` when it
    * would be "1h" (exercising the consumer default E15 inside the E2E).
    */
  def fixtureMessages: Seq[String] = for {
    (sym, s) <- symbols.zipWithIndex
    (iv, v) <- intervals.zipWithIndex
    i <- 0 until nPerSeries
  } yield {
    val stepMs = if (iv == "1h") 3600000L else 86400000L
    val openT = baseMs + i * stepMs
    val closeT = openT + stepMs - 1
    val ivField = if (iv == "1h" && i % 5 == 0) "" else s""""interval":"$iv","""
    s"""{"symbol":"$sym",$ivField"open_time":$openT,"open":"${price(s, v, i)}","high":"${price(s, v, i)}","low":"${price(s, v, i)}","close":"${price(s, v, i)}","volume":"1000.00","close_time":$closeT,"fetched_at":"2024-01-01T00:00:00"}"""
  }

  def run(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = fixtureMessages.toDF("value")
    val klines = KafkaJson.parsePrices(raw)
    val wh = Ingest.toWarehouse(klines,
      Seq.empty[(Int, String)].toDF("symbol_id", "symbol_name"),
      Seq.empty[(Int, String)].toDF("interval_id", "interval_name"))
    val typeDim = graft.model.Schemas.indicatorTypeSeed.toDF("type_id", "type_name")
    IndicatorJob.computeIndicators(wh, typeDim)
      .select(col("symbol_id"), col("interval_id"), col("type_id"),
        unix_timestamp(col("timestamp")).as("ts_sec"),
        round(col("value").cast("double"), 4).as("value"))
  }

  val oracle: String = {
    val vals = fixtureMessages.map(f => "('" + f.replace("'", "''") + "')").mkString(", ")
    s"""WITH raw(value) AS (VALUES $vals),
       |m AS (
       |  SELECT
       |    json_extract_string(value, '$$.symbol') AS symbol_name,
       |    COALESCE(json_extract_string(value, '$$.interval'), '1h') AS interval_name,
       |    CAST(json_extract_string(value, '$$.close') AS DECIMAL(20,10)) AS close_price,
       |    CAST(json_extract_string(value, '$$.close_time') AS BIGINT) // 1000 AS close_sec
       |  FROM raw
       |), keyed AS (
       |  SELECT CAST(dense_rank() OVER (ORDER BY symbol_name) AS BIGINT) AS symbol_id,
       |         CAST(dense_rank() OVER (ORDER BY interval_name) AS BIGINT) AS interval_id,
       |         CAST(close_price AS DOUBLE) AS p, close_sec
       |  FROM m
       |), diffs AS (
       |  SELECT *, p - lag(p) OVER (PARTITION BY symbol_id, interval_id ORDER BY close_sec) AS diff
       |  FROM keyed
       |), gl AS (
       |  SELECT *,
       |    CASE WHEN diff > 0 THEN diff ELSE 0.0 END AS gain,
       |    CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS loss
       |  FROM diffs
       |), wide AS (
       |  SELECT symbol_id, interval_id, close_sec,
       |    AVG(p) OVER w AS sma,
       |    100.0 - 100.0 / (1.0 + (AVG(gain) OVER w) / NULLIF(AVG(loss) OVER w, 0.0)) AS rsi,
       |    AVG(p) OVER w + 2 * STDDEV_SAMP(p) OVER w AS bb_up,
       |    AVG(p) OVER w - 2 * STDDEV_SAMP(p) OVER w AS bb_down
       |  FROM gl
       |  WINDOW w AS (PARTITION BY symbol_id, interval_id ORDER BY close_sec
       |               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
       |), long AS (
       |  SELECT symbol_id, interval_id, close_sec, 'SMA' AS type_name, sma AS value FROM wide
       |  UNION ALL SELECT symbol_id, interval_id, close_sec, 'RSI', rsi FROM wide
       |  UNION ALL SELECT symbol_id, interval_id, close_sec, 'BB_UP', bb_up FROM wide
       |  UNION ALL SELECT symbol_id, interval_id, close_sec, 'BB_DOWN', bb_down FROM wide
       |), dim AS (
       |  SELECT * FROM (VALUES (1,'SMA'),(2,'RSI'),(3,'BB_UP'),(4,'BB_DOWN')) AS t(type_id, type_name)
       |)
       |SELECT l.symbol_id, l.interval_id, d.type_id, l.close_sec AS ts_sec,
       |  ROUND(CAST(CAST(l.value AS DECIMAL(18,8)) AS DOUBLE), 4) AS value
       |FROM long l JOIN dim d ON l.type_name = d.type_name
       |WHERE l.value IS NOT NULL""".stripMargin
  }
}
