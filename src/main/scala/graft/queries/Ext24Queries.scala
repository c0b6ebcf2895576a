package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-6 extension batch 6: engine-level aggregate operators — custom
  * typed aggregators that change the SHUFFLE SHAPE of a query, not just its
  * expression tree (the `MinHashAgg` tier of extension, SURVEY.md §2's
  * "ORDER BY + LIMIT per symbol" dashboard slices).
  */
object Ext24Queries {

  /** Top-3 orders per customer via [[graft.functions.TopKAgg]] — the bounded
    * map-side top-k aggregate: each partition ships at most k rows per
    * customer, replacing the `row_number() OVER` window that would sort every
    * order of every customer after a full shuffle. The (price DESC, orderkey
    * ASC) total order makes the result identical to the window formulation
    * (the oracle) under any partitioning.
    */
  def topkAgg(s: SparkSession, dir: String): DataFrame = {
    val top3 = udaf(new graft.functions.TopKAgg(3),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_custkey"), (col("pos") + 1).cast("int").as("rnk"),
        col("t._2").as("o_orderkey"), col("t._1").as("o_totalprice"))
  }

  val topkAggOracle: String =
    """SELECT o_custkey, CAST(rn AS INT) AS rnk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |)
      |WHERE rn <= 3""".stripMargin
}
