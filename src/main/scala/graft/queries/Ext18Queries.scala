package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Customer-analytics extension batch: RFM quintile segmentation, synchronous
  * label-propagation community detection on the brand co-purchase graph,
  * walk-forward forecast backtesting (naive vs SMA-3 MAE), and rolling
  * 24-hour beta of each event stream against the all-stream market index.
  * All DuckDB-oracled with the repo's parity conventions.
  */
object Ext18Queries {

  // --- segmentation ------------------------------------------------------------

  /** RFM segmentation: recency (days since last order at corpus close),
    * frequency (order count), monetary (exact DECIMAL revenue), each scored
    * into ntile(5) quintiles with 5 = best, concatenated into the classic
    * three-digit segment. The corpus collapses to one row per customer
    * before any ranking; the three quintile ranks then run customer-
    * cardinality-sized, so NO single-partition window ever sees them —
    * each is a two-phase bucketed rank ([[graft.operators.PrefixSum
    * .rankedPrefix]]) with the exact ntile(5) distribution recomputed
    * arithmetically from (rank, n). Each rank pass is localCheckpoint'd so
    * the next pass's bucket probe re-reads materialized rows, not the
    * unrolled window lineage.
    */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PrefixSum
    val base = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(max("o_orderdate").as("last_dt"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast(DecimalType(18, 6))).as("rev"))
      .crossJoin(broadcast(
        Tables.orders(s, dir).agg(max("o_orderdate").as("corpus_max"))))
      .select(col("o_custkey"),
        datediff(col("corpus_max"), col("last_dt")).as("recency_days"),
        col("frequency"), col("rev"))
      .localCheckpoint(eager = false)
    val n = broadcast(base.agg(count(lit(1)).as("_n")))
    val r1 = PrefixSum.rankedPrefix(base, "recency_days", descOrder = true,
      Seq("o_custkey"), Nil, "_rn_r").localCheckpoint(eager = false)
    val r2 = PrefixSum.rankedPrefix(r1, "frequency", descOrder = false,
      Seq("o_custkey"), Nil, "_rn_f").localCheckpoint(eager = false)
    val r3 = PrefixSum.rankedPrefix(r2, "rev", descOrder = false,
      Seq("o_custkey"), Nil, "_rn_m")
    val scored = Seq(("_rn_r", "r_score"), ("_rn_f", "f_score"),
      ("_rn_m", "m_score")).foldLeft(r3.crossJoin(n)) {
        case (d, (rn, out)) => PrefixSum.ntileFromRank(d, rn, "_n", 5, out)
      }
    scored
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("rev").cast("double").as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
  }

  val rfmOracle: String =
    """WITH base AS (
      |  SELECT o_custkey,
      |    date_diff('day', MAX(o_orderdate),
      |      (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
      |    CAST(COUNT(*) AS BIGINT) AS frequency,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o_custkey, CAST(recency_days AS INT) AS recency_days,
      |  frequency, CAST(rev AS DOUBLE) AS monetary,
      |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS INT)
      |    AS r_score,
      |  CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS INT)
      |    AS f_score,
      |  CAST(ntile(5) OVER (ORDER BY rev, o_custkey) AS INT) AS m_score,
      |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS VARCHAR)
      |    || CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS VARCHAR)
      |    || CAST(ntile(5) OVER (ORDER BY rev, o_custkey) AS VARCHAR)
      |    AS segment
      |FROM base""".stripMargin

  // --- communities -------------------------------------------------------------

  /** Synchronous label propagation (two unrolled rounds) on the weighted
    * brand co-purchase graph: each brand adopts the label with the highest
    * total incident edge weight among its neighbors, ties broken by the
    * smallest label. Every round is one join + two aggregates on the
    * |items|^2-bounded edge list — the corpus only builds the edge weights
    * once. Deterministic (integer weights, lexicographic tie-break), so the
    * unrolled oracle matches exactly.
    */
  def lpaCommunities(s: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      .distinct()
    val pairs = items.select(col("basket"), col("item").as("src"))
      .join(items.select(col("basket"), col("item").as("dst")), Seq("basket"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    // one sync round: label(v) := argmax_label sum(w to neighbors w/ label)
    def lpaRound(labels: DataFrame): DataFrame =
      pairs.join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(sum("w").as("wsum"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("src").orderBy(col("wsum").desc, col("label"))))
        .filter(col("rk") === 1)
        .select(col("src").as("node"), col("label"))
    val init = items.select(col("item").as("node")).distinct()
      .withColumn("label", col("node"))
    lpaRound(lpaRound(init)).select(col("node"), col("label").as("community"))
  }

  val lpaCommunitiesOracle: String =
    """WITH items AS (
      |  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |), pairs AS (
      |  SELECT a.item AS src, b.item AS dst, CAST(COUNT(*) AS BIGINT) AS w
      |  FROM items a JOIN items b
      |    ON a.basket = b.basket AND a.item <> b.item
      |  GROUP BY a.item, b.item
      |), l0 AS (
      |  SELECT DISTINCT item AS node, item AS label FROM items
      |), r1 AS (
      |  SELECT src AS node, label FROM (
      |    SELECT p.src, l.label, SUM(p.w) AS wsum,
      |      row_number() OVER (PARTITION BY p.src
      |        ORDER BY SUM(p.w) DESC, l.label) AS rk
      |    FROM pairs p JOIN l0 l ON l.node = p.dst
      |    GROUP BY p.src, l.label
      |  ) WHERE rk = 1
      |), r2 AS (
      |  SELECT src AS node, label FROM (
      |    SELECT p.src, l.label, SUM(p.w) AS wsum,
      |      row_number() OVER (PARTITION BY p.src
      |        ORDER BY SUM(p.w) DESC, l.label) AS rk
      |    FROM pairs p JOIN r1 l ON l.node = p.dst
      |    GROUP BY p.src, l.label
      |  ) WHERE rk = 1
      |)
      |SELECT node, label AS community FROM r2""".stripMargin

  // --- backtesting -------------------------------------------------------------

  /** Walk-forward forecast backtest over each stream's hourly mean series:
    * mean absolute error of the naive (last value) forecast vs the SMA-3
    * forecast, plus the skill ratio. Absolute errors are DECIMAL-staged so
    * the MAEs are order-independent; the evaluation set is hours where all
    * three lags exist (identical filter on both engines). Everything past
    * the hourly rollup runs on the bounded candle series.
    */
  def forecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hr"))
      .agg((sum(col("value").cast(DecimalType(28, 12))).cast("double")
        / count(lit(1))).as("m"))
    val w = Window.partitionBy("event_type").orderBy("hr")
    hourly
      .withColumn("l1", lag("m", 1).over(w))
      .withColumn("l2", lag("m", 2).over(w))
      .withColumn("l3", lag("m", 3).over(w))
      .filter(col("l3").isNotNull)
      .withColumn("e_naive", abs(col("m") - col("l1")))
      .withColumn("e_sma3",
        abs(col("m") - (col("l1") + col("l2") + col("l3")) / lit(3.0)))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_evals"),
        round(sum(col("e_naive").cast(DecimalType(28, 12))).cast("double")
          / count(lit(1)), 6).as("mae_naive"),
        round(sum(col("e_sma3").cast(DecimalType(28, 12))).cast("double")
          / count(lit(1)), 6).as("mae_sma3"))
  }

  val forecastBacktestOracle: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
      |  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
      |), lagged AS (
      |  SELECT event_type, m,
      |    lag(m, 1) OVER w AS l1, lag(m, 2) OVER w AS l2,
      |    lag(m, 3) OVER w AS l3
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
      |), err AS (
      |  SELECT event_type, abs(m - l1) AS e_naive,
      |    abs(m - (l1 + l2 + l3) / 3.0) AS e_sma3
      |  FROM lagged WHERE l3 IS NOT NULL
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_evals,
      |  ROUND(CAST(SUM(CAST(e_naive AS DECIMAL(28,12))) AS DOUBLE)
      |    / COUNT(*), 6) AS mae_naive,
      |  ROUND(CAST(SUM(CAST(e_sma3 AS DECIMAL(28,12))) AS DOUBLE)
      |    / COUNT(*), 6) AS mae_sma3
      |FROM err GROUP BY event_type""".stripMargin

  // --- rolling beta ------------------------------------------------------------

  /** Rolling 24-hour beta of each stream's hourly mean against the
    * all-stream market index: beta = cov(x, mkt)/var(mkt) over a ROWS
    * 23-PRECEDING window, computed from DECIMAL-staged rolling moment sums
    * (sum x, sum y, sum xy, sum y^2) so every window's statistic is exact
    * until the final division. Emits the last eight fully-populated windows
    * per stream. The market series joins back by hour — a broadcast-sized
    * dimension of calendar length.
    */
  def rollingBeta(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hr"))
      .agg((sum(col("value").cast(DecimalType(28, 12))).cast("double")
        / count(lit(1))).as("m"))
    val market = Tables.events(s, dir)
      .groupBy(expr("ts_us div 3600000000").as("hr"))
      .agg((sum(col("value").cast(DecimalType(28, 12))).cast("double")
        / count(lit(1))).as("mkt"))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(-23, Window.currentRow)
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 12))
    val joined = hourly.join(broadcast(market), Seq("hr"))
    val wLast = Window.partitionBy("event_type").orderBy(col("hr").desc)
    joined
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(dec(col("m"))).over(w).cast("double"))
      .withColumn("sy", sum(dec(col("mkt"))).over(w).cast("double"))
      .withColumn("sxy", sum(dec(col("m") * col("mkt"))).over(w).cast("double"))
      .withColumn("syy", sum(dec(col("mkt") * col("mkt"))).over(w).cast("double"))
      .filter(col("n") === 24)
      .withColumn("beta",
        (col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("syy") - col("sy") * col("sy")))
      .withColumn("rk", row_number().over(wLast))
      .filter(col("rk") <= 8)
      .select(col("event_type"), col("hr"), round(col("beta"), 6).as("beta"))
  }

  val rollingBetaOracle: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |    CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
      |  FROM events GROUP BY event_type, epoch_us(ts) // 3600000000
      |), market AS (
      |  SELECT epoch_us(ts) // 3600000000 AS hr,
      |    CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
      |      AS mkt
      |  FROM events GROUP BY epoch_us(ts) // 3600000000
      |), joined AS (
      |  SELECT h.event_type, h.hr, h.m, k.mkt
      |  FROM hourly h JOIN market k ON h.hr = k.hr
      |), roll AS (
      |  SELECT event_type, hr,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
      |    CAST(SUM(CAST(m AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(mkt AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(m * mkt AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(mkt * mkt AS DECIMAL(38,12))) OVER w AS DOUBLE)
      |      AS syy
      |  FROM joined
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
      |), betas AS (
      |  SELECT event_type, hr,
      |    (n * sxy - sx * sy) / (n * syy - sy * sy) AS beta
      |  FROM roll WHERE n = 24
      |)
      |SELECT event_type, hr, ROUND(beta, 6) AS beta
      |FROM betas
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY hr DESC) <= 8""".stripMargin
}
