package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Round-6 extension batch 11: two remaining order-statistics/interval
  * shapes — the exact WEIGHTED median (cumulative-weight scan, the
  * volume-weighted center a plain percentile misses) and interval-union
  * coverage (sweep-line merge of overlapping spans — the session-time /
  * uptime primitive that double-counts without the merge).
  */
object Ext30Queries {

  /** Exact weighted median: per return flag, the smallest price whose
    * cumulative quantity weight reaches half the total. One sort-window
    * over each group with a DECIMAL-exact running weight (2·cum >= total
    * — no float threshold), then the first qualifying row by the same
    * total order. At scale this is one shuffle+sort per group — the same
    * cost envelope as any ranked window; no per-group collect, no
    * interpolation ambiguity.
    */
  def weightedPercentile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag"), col("l_extendedprice"),
      col("l_quantity").cast(DecimalType(18, 2)).as("w"),
      col("l_orderkey"), col("l_linenumber"))
    val ord = Seq(col("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    val wCum = Window.partitionBy("l_returnflag").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("l_returnflag")
    val wPick = Window.partitionBy("l_returnflag").orderBy(ord: _*)
    li.withColumn("cumw", sum(col("w")).over(wCum))
      .withColumn("totw", sum(col("w")).over(wTot))
      .filter(col("cumw") * 2 >= col("totw"))
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"),
        col("l_extendedprice").as("weighted_median"),
        col("totw").cast("double").as("total_weight"))
  }

  val weightedPercentileOracle: String =
    """WITH li AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS w,
      |    l_orderkey, l_linenumber
      |  FROM lineitem
      |), cums AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    SUM(w) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(w) OVER (PARTITION BY l_returnflag) AS totw,
      |    l_orderkey, l_linenumber
      |  FROM li
      |)
      |SELECT l_returnflag, l_extendedprice AS weighted_median,
      |  CAST(totw AS DOUBLE) AS total_weight
      |FROM cums
      |WHERE cumw * 2 >= totw
      |QUALIFY row_number() OVER (PARTITION BY l_returnflag
      |  ORDER BY l_extendedprice, l_orderkey, l_linenumber) = 1""".stripMargin

  /** Interval-union coverage: treat each event as a 30-minute activity
    * span and compute, per user, the MERGED covered time and span count —
    * the sweep-line island pattern on continuous time (overlapping spans
    * must not double-count). A span starts a new island when it opens
    * after the running max of all previous ends; islands then aggregate
    * with exact integer microsecond arithmetic. One sort-window per user
    * partition — no self-join, no interval explosion.
    */
  def intervalCoverage(s: SparkSession, dir: String): DataFrame = {
    val spanUs = 1800000000L // 30 min
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts_us").as("lo"),
        (col("ts_us") + spanUs).as("hi"))
    val wPrev = Window.partitionBy("user_id").orderBy("lo", "hi")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wSeq = Window.partitionBy("user_id").orderBy("lo", "hi")
    val islands = ev
      .withColumn("prev_max_hi", max(col("hi")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max_hi").isNull ||
          col("lo") > col("prev_max_hi"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wSeq))
      .groupBy("user_id", "island")
      .agg(min("lo").as("ilo"), max("hi").as("ihi"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("ihi") - col("ilo")).as("covered_us"))
  }

  val intervalCoverageOracle: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS lo,
      |    epoch_us(ts) + 1800000000 AS hi
      |  FROM events
      |), marked AS (
      |  SELECT user_id, lo, hi,
      |    CASE WHEN MAX(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR lo > MAX(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island
      |  FROM ev
      |), grp AS (
      |  SELECT user_id, lo, hi,
      |    SUM(new_island) OVER (PARTITION BY user_id ORDER BY lo, hi
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM marked
      |), islands AS (
      |  SELECT user_id, island, MIN(lo) AS ilo, MAX(hi) AS ihi
      |  FROM grp GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  CAST(SUM(ihi - ilo) AS BIGINT) AS covered_us
      |FROM islands GROUP BY user_id""".stripMargin
}
