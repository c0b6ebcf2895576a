package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-3 breadth batch 1: window-function completion (ntile / percent_rank
  * / cume_dist / lead), min_by/max_by aggregates, deterministic hash
  * sampling, SCD2 gaps-and-islands, MERGE-style upsert, fixed-width
  * histograms, the map-column surface, and a BPE-style pre-tokenizer.
  *
  * Every query is DuckDB-oracled. Scale posture notes inline: each op is a
  * single shuffle on its natural key (or none), no driver-side loops.
  */
object Ext4Queries {

  /** Distribution window functions over orders: ntile quartiles,
    * percent_rank, cume_dist, lead — the ranking surface SURVEY §2.6 notes
    * the reference lacks. One shuffle on the partition key; the tiebreak
    * (o_orderkey) makes every function deterministic.
    */
  def windowNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_orderpriority"),
      ntile(4).over(w).as("tile"),
      round(percent_rank().over(w), 6).as("pr"),
      round(cume_dist().over(w), 6).as("cd"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"))
  }

  val windowNtileOracle: String =
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4) OVER w AS tile,
      |  ROUND(percent_rank() OVER w, 6) AS pr,
      |  ROUND(cume_dist() OVER w, 6) AS cd,
      |  lead(o_totalprice) OVER w AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** min_by / max_by argmin aggregates. `value` carries duplicates, so the
    * ordering key is made unique by composing floor(value*1e6) with the
    * unique event_id (floor, not cast: Spark casts double->long by
    * truncation, DuckDB by rounding — floor is the portable spelling).
    */
  def minMaxBy(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        expr("CAST(floor(value * 1000000) AS BIGINT) * 1000000 + event_id"))
      .groupBy("event_type")
      .agg(
        expr("min_by(event_id, k)").as("min_event"),
        expr("max_by(event_id, k)").as("max_event"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  val minMaxByOracle: String =
    """SELECT event_type,
      |  min_by(event_id, k) AS min_event,
      |  max_by(event_id, k) AS max_event,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value
      |FROM (SELECT *,
      |        CAST(floor(value * 1000000) AS BIGINT) * 1000000 + event_id AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  /** Deterministic hash-based sampling — the scale path for "give me a
    * reproducible 10% of 100 TB": a pure function of the row key, no RNG
    * state, no sort, stable under re-partitioning and re-runs (Spark
    * TABLESAMPLE is partition-order-dependent; this is not). md5-prefix
    * arithmetic matches DuckDB bit-for-bit (same trick as simhash).
    */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 100 < 10"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        min("event_id").as("min_id"),
        max("event_id").as("max_id"))

  val hashSampleOracle: String =
    """SELECT event_type, COUNT(*) AS n_sampled,
      |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM events
      |WHERE CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS UBIGINT) % 100 < 10
      |GROUP BY event_type""".stripMargin

  /** SCD2 interval build via gaps-and-islands: collapse each user's
    * consecutive runs of one event_type into (valid_from, valid_to] rows —
    * the change-data-capture compaction a warehouse dimension needs. Two
    * window passes + one aggregation, all on the same user_id partitioning
    * (a single shuffle reused across stages).
    */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_scd")
    s.sql(
      """WITH o AS (
        |  SELECT user_id, event_id, ts_us, event_type,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events_scd WHERE user_id < 50
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), isl AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS island
        |  FROM o
        |), grp AS (
        |  SELECT user_id, island, event_type,
        |    MIN(ts_us) AS valid_from, MAX(ts_us) AS last_seen,
        |    COUNT(*) AS n_rows
        |  FROM isl GROUP BY user_id, island, event_type
        |)
        |SELECT user_id, island, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) AS valid_to,
        |  last_seen, n_rows
        |FROM grp""".stripMargin)
  }

  val scd2Oracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
      |  FROM events WHERE user_id < 50
      |), o AS (
      |  SELECT *,
      |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      |), isl AS (
      |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      |  FROM o
      |), grp AS (
      |  SELECT user_id, island, event_type,
      |    MIN(ts_us) AS valid_from, MAX(ts_us) AS last_seen,
      |    COUNT(*) AS n_rows
      |  FROM isl GROUP BY user_id, island, event_type
      |)
      |SELECT user_id, island, event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) AS valid_to,
      |  last_seen, n_rows
      |FROM grp""".stripMargin

  /** MERGE-style upsert expressed as full-outer-join + coalesce arithmetic:
    * a first-half-of-time per-user snapshot (the target) merged with
    * second-half arrivals (the source) — matched rows update, unmatched
    * source rows insert, untouched target rows keep. The classic
    * Delta/Iceberg MERGE INTO re-expressed engine-side; one shuffle on the
    * merge key.
    */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_mrg")
    s.sql(
      """WITH b AS (
        |  SELECT (MIN(ts_us) + MAX(ts_us)) DIV 2 AS cut FROM events_mrg
        |), tgt AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events_mrg CROSS JOIN b WHERE ts_us < cut GROUP BY user_id
        |), src AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events_mrg CROSS JOIN b WHERE ts_us >= cut GROUP BY user_id
        |)
        |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
        |  COALESCE(t.n, 0) + COALESCE(s.n, 0) AS n_events,
        |  CAST(COALESCE(t.sv, 0) + COALESCE(s.sv, 0) AS DOUBLE) AS sum_value,
        |  CASE WHEN t.user_id IS NULL THEN 'insert'
        |       WHEN s.user_id IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id""".stripMargin)
  }

  val mergeUpsertOracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
      |), b AS (
      |  SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS cut FROM e
      |), tgt AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM e CROSS JOIN b WHERE ts_us < cut GROUP BY user_id
      |), src AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM e CROSS JOIN b WHERE ts_us >= cut GROUP BY user_id
      |)
      |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
      |  COALESCE(t.n, 0) + COALESCE(s.n, 0) AS n_events,
      |  CAST(COALESCE(t.sv, 0) + COALESCE(s.sv, 0) AS DOUBLE) AS sum_value,
      |  CASE WHEN t.user_id IS NULL THEN 'insert'
      |       WHEN s.user_id IS NULL THEN 'keep'
      |       ELSE 'update' END AS action
      |FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id""".stripMargin

  /** Fixed-width histogram with per-group shares: floor-bucketing is a pure
    * projection (map-side), so the only shuffle is the (event_type, bucket)
    * aggregation; the share is a second window over the tiny aggregate.
    */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    val bucketed = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("CAST(floor(value / 50) AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n"))
    bucketed.select(
      col("event_type"), col("bucket"), col("n"),
      round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("event_type")), 6).as("share"))
  }

  val histogramOracle: String =
    """WITH h AS (
      |  SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS bucket,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, bucket, n,
      |  ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type), 6) AS share
      |FROM h""".stripMargin

  /** Map-column surface: per-user event_type->count as a MapType built with
    * map_from_entries over a sorted entry array, probed with try_element_at
    * (ANSI throws on missing keys with plain element_at) and rendered
    * deterministically via map_entries. Maps leave the gate as strings (no
    * cross-engine map rendering).
    */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("n"))))).as("m"))
      .select(
        col("user_id"),
        size(col("m")).as("n_keys"),
        coalesce(try_element_at(col("m"), lit("click")), lit(0L)).as("n_clicks"),
        concat_ws(",", transform(map_entries(col("m")),
          (e: Column) => concat(e.getField("key"), lit(":"), e.getField("value"))))
          .as("rendered"))

  val mapFuncsOracle: String =
    """WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT user_id, COUNT(*) AS n_keys,
      |  COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0) AS n_clicks,
      |  string_agg(event_type || ':' || n, ',' ORDER BY event_type) AS rendered
      |FROM c GROUP BY user_id""".stripMargin

  /** BPE-style pre-tokenization (the GPT-2 pattern family, ASCII-simplified,
    * no lookarounds so Java regex and RE2 agree): token counts per document
    * plus a chars-per-token compression proxy — the token-budget accounting
    * a training-data pipeline runs over every shard.
    */
  def bpeTokenize(s: SparkSession, dir: String): DataFrame = {
    val pat = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$pat', 0)")).as("n_tokens"),
      size(expr("regexp_extract_all(text, ' ?[0-9]+', 0)")).as("n_num_tokens"),
      round(col("n_chars").cast("double") /
        nullif(size(expr(s"regexp_extract_all(text, '$pat', 0)")).cast("double"),
          lit(0.0)), 6).as("chars_per_token"))
  }

  val bpeTokenizeOracle: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +')) AS n_tokens,
      |  len(regexp_extract_all(text, ' ?[0-9]+')) AS n_num_tokens,
      |  ROUND(CAST(n_chars AS DOUBLE) / NULLIF(
      |    len(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +')), 0),
      |    6) AS chars_per_token
      |FROM documents""".stripMargin
}
