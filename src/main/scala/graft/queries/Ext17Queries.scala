package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Signal-extraction extension batch: marketing attribution (last-touch +
  * linear credit over a conversion window), CUSUM changepoint detection,
  * the Theil-Sen robust trend estimator, hashing-trick feature
  * vectorization (the fixed-width sibling of q_tfidf, portable md5
  * bucketing), and Holt's double-exponential smoothing (level + trend, the
  * forecasting upgrade of q_ewma's single-state fold). All DuckDB-oracled
  * with the repo's exact-parity conventions (DECIMAL staging, md5 buckets,
  * left-to-right folds).
  */
object Ext17Queries {

  // --- attribution -------------------------------------------------------------

  /** Conversion attribution: every purchase is credited to the clicks of
    * the same user within the preceding hour — last-touch picks the most
    * recent click, linear splits one unit of credit across all touches.
    * The touch join is an equi-join on the user key plus a bounded range
    * predicate; at 100 TB the range residual rides the user-key shuffle
    * (or the binned-interval shape of q_binned_range_join for hot users).
    * Only purchases with at least one touch convert — untouched purchases
    * drop out, matching the oracle's inner join.
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("c_ts"),
        col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"),
        col("event_id").as("purchase_id"))
    val touches = purchases.join(clicks, Seq("user_id"))
      .filter(col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - lit(3600000000L))
    touches
      .withColumn("rk", row_number().over(
        Window.partitionBy("purchase_id")
          .orderBy(col("c_ts").desc, col("click_id").desc)))
      .groupBy("purchase_id")
      .agg(
        count(lit(1)).as("n_touches"),
        max(when(col("rk") === 1, col("click_id"))).as("last_touch_id"),
        round(lit(1.0) / count(lit(1)), 6).as("linear_credit"))
  }

  val attributionOracle: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_us(ts) AS c_ts, event_id AS click_id
      |  FROM events WHERE event_type = 'click'
      |), purchases AS (
      |  SELECT user_id, epoch_us(ts) AS p_ts, event_id AS purchase_id
      |  FROM events WHERE event_type = 'purchase'
      |), touches AS (
      |  SELECT p.purchase_id, c.click_id, c.c_ts,
      |    row_number() OVER (PARTITION BY p.purchase_id
      |      ORDER BY c.c_ts DESC, c.click_id DESC) AS rk
      |  FROM purchases p JOIN clicks c ON p.user_id = c.user_id
      |  WHERE c.c_ts < p.p_ts AND c.c_ts >= p.p_ts - 3600000000
      |)
      |SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_touches,
      |  MAX(CASE WHEN rk = 1 THEN click_id END) AS last_touch_id,
      |  ROUND(CAST(1.0 AS DOUBLE) / COUNT(*), 6) AS linear_credit
      |FROM touches GROUP BY purchase_id""".stripMargin

  // --- changepoints ------------------------------------------------------------

  /** CUSUM changepoint detection per event-type stream: cumulative sum of
    * deviations of the hourly mean from the stream mean; the changepoint is
    * the hour where |S_t| peaks. Hourly means and the deviation partial
    * sums are DECIMAL-staged, so S_t is exact and the argmax is
    * deterministic on both engines. Everything past the hourly rollup runs
    * on the bounded candle series.
    */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hr"))
      .agg((sum(col("value").cast(DecimalType(28, 12))).cast("double")
        / count(lit(1))).as("m"))
    val wt = Window.partitionBy("event_type")
    val wcum = wt.orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("mu",
        sum(col("m").cast(DecimalType(28, 12))).over(wt).cast("double")
          / count(lit(1)).over(wt))
      .withColumn("s",
        sum((col("m") - col("mu")).cast(DecimalType(28, 12))).over(wcum)
          .cast("double"))
      .withColumn("n_hours", count(lit(1)).over(wt))
      .withColumn("rk", row_number().over(
        wt.orderBy(abs(col("s")).desc, col("hr"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("hr").as("changepoint_hr"),
        round(col("s"), 6).as("cusum_peak"), col("n_hours"))
  }

  val cusumChangepointOracle: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
      |  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
      |), dev AS (
      |  SELECT event_type, hr, m,
      |    CAST(SUM(CAST(m AS DECIMAL(28,12))) OVER (PARTITION BY event_type)
      |      AS DOUBLE) / COUNT(*) OVER (PARTITION BY event_type) AS mu,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_hours
      |  FROM hourly
      |), cum AS (
      |  SELECT event_type, hr, n_hours,
      |    CAST(SUM(CAST(m - mu AS DECIMAL(28,12))) OVER (
      |      PARTITION BY event_type ORDER BY hr
      |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS s
      |  FROM dev
      |)
      |SELECT event_type, hr AS changepoint_hr, ROUND(s, 6) AS cusum_peak,
      |  n_hours
      |FROM cum
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY abs(s) DESC, hr) = 1""".stripMargin

  // --- robust regression -------------------------------------------------------

  /** Theil-Sen robust trend of the 'click' stream's hourly means: the
    * median of all pairwise slopes (m_j - m_i)/(hr_j - hr_i). The series
    * length is bounded by the calendar (hours in the corpus window), not
    * the corpus size, so the all-pairs expansion is a bounded self-join —
    * the estimator stays exact at any corpus scale. Median matches
    * DuckDB's quantile_cont interpolation (the q_percentile convention).
    */
  def theilSen(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .groupBy(expr("ts_us div 3600000000").as("hr"))
      .agg((sum(col("value").cast(DecimalType(28, 12))).cast("double")
        / count(lit(1))).as("m"))
    val a = hourly.select(col("hr").as("hr_a"), col("m").as("m_a"))
    val b = hourly.select(col("hr").as("hr_b"), col("m").as("m_b"))
    a.join(b, col("hr_a") < col("hr_b"))
      .select(((col("m_b") - col("m_a"))
        / (col("hr_b") - col("hr_a"))).as("slope"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("ts_slope"))
  }

  val theilSenOracle: String =
    """WITH hourly AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hr,
      |    CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
      |  FROM events WHERE event_type = 'click'
      |  GROUP BY epoch_us(ts) // 3600000000
      |), slopes AS (
      |  SELECT (b.m - a.m) / (b.hr - a.hr) AS slope
      |  FROM hourly a JOIN hourly b ON a.hr < b.hr
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  ROUND(quantile_cont(slope, 0.5), 6) AS ts_slope
      |FROM slopes""".stripMargin

  // --- feature hashing ---------------------------------------------------------

  /** Hashing-trick vectorization: tokens of the first hundred documents
    * hashed into 64 buckets via the portable md5-prefix convention (same as
    * q_hash_sample), emitting the sparse (doc, bucket, count) triples that
    * feed a fixed-width linear model regardless of vocabulary growth. Pure
    * map + one aggregate on (doc, bucket) — no vocabulary table, which is
    * the entire point of the hashing trick at 100 TB.
    */
  def featureHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .withColumn("bucket", expr(
        "CAST(CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS BIGINT) % 64 AS INT)"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("cnt"))

  val featureHashOracle: String =
    """SELECT doc_id,
      |  CAST(CAST('0x' || substr(md5(tok), 1, 4) AS UBIGINT) % 64 AS INT)
      |    AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM (
      |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |  FROM documents WHERE doc_id < 100
      |)
      |GROUP BY doc_id, bucket""".stripMargin

  // --- forecasting -------------------------------------------------------------

  /** Holt's double-exponential smoothing (alpha = 0.2, beta = 0.3) over
    * each user's event-value series: a left fold carrying (level, trend)
    * state, seeded with (first value, 0). Same engine-parity shape as
    * q_ewma — Spark's `aggregate` HOF and DuckDB's `list_reduce` both fold
    * left-to-right over the identically-ordered series with identical
    * inlined update arithmetic, so the state stays bit-equal. Emits the
    * final state and the 3-step-ahead forecast level + 3 x trend.
    */
  def holtSmoothing(s: SparkSession, dir: String): DataFrame = {
    val vals = transform(array_sort(col("raw")), x => x.getField("value"))
    val states = transform(vals,
      x => struct(x.as("l"), lit(0.0).as("b")))
    val folded = aggregate(
      slice(states, lit(2), greatest(size(states) - 1, lit(0))),
      element_at(states, 1),
      (acc, v) => {
        val l = acc.getField("l")
        val b = acc.getField("b")
        val x = v.getField("l")
        val newL = lit(0.2) * x + lit(0.8) * (l + b)
        struct(newL.as("l"),
          (lit(0.3) * (newL - l) + lit(0.7) * b).as("b"))
      })
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(collect_list(struct(col("ts_us"), col("event_id"), col("value")))
        .as("raw"))
      .select(
        col("user_id"),
        size(vals).as("n_events"),
        round(folded.getField("l"), 6).as("level"),
        round(folded.getField("b"), 6).as("trend"),
        round(folded.getField("l") + lit(3) * folded.getField("b"), 6)
          .as("forecast_3"))
  }

  /** The oracle unrolls the fold as a recursive CTE rather than a
    * `list_reduce` over a struct accumulator: DuckDB 1.0's struct-typed
    * list_reduce was observed evaluating the second field against a
    * partially-updated accumulator (step k's `acc.l` already holds step
    * k's new level), which silently diverges from the standard fold. The
    * recursive CTE applies the identical scalar update per step, so the
    * doubles match Spark's `aggregate` bit-for-bit.
    */
  val holtSmoothingOracle: String =
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, value,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS i
      |  FROM events
      |), nn AS (
      |  SELECT user_id, MAX(i) AS n FROM seq GROUP BY user_id
      |), rec(user_id, i, l, b) AS (
      |  SELECT user_id, i, value, CAST(0.0 AS DOUBLE)
      |  FROM seq WHERE i = 1
      |  UNION ALL
      |  SELECT s.user_id, s.i,
      |    0.2 * s.value + 0.8 * (r.l + r.b),
      |    0.3 * (0.2 * s.value + 0.8 * (r.l + r.b) - r.l) + 0.7 * r.b
      |  FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.i = r.i + 1
      |)
      |SELECT r.user_id, CAST(nn.n AS INT) AS n_events,
      |  ROUND(r.l, 6) AS level, ROUND(r.b, 6) AS trend,
      |  ROUND(r.l + 3 * r.b, 6) AS forecast_3
      |FROM rec r JOIN nn ON nn.user_id = r.user_id AND r.i = nn.n""".stripMargin
}
