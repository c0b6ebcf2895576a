package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext25Queries
import graft.sources.Tables

/** Semantic invariants for the derived-partsupp TPC-H batch (the oracle
  * gate proves value parity; these pin the properties the adaptations
  * must preserve).
  */
class Ext25Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("Q2: one minimum cost per part — every surviving row ties it") {
    val rows = Ext25Queries.tpchQ2(spark, sf).collect()
    assert(rows.nonEmpty)
    // within a part, every surviving supplier quotes the identical cost
    rows.groupBy(_.getAs[Long]("p_partkey")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("supplycost")).distinct.length == 1)
    }
    // and all suppliers sit in the EUROPE region
    val euNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(euNations.contains(r.getAs[String]("n_name"))))
  }

  test("Q9: profit decomposes as revenue minus cost — both signs possible, " +
    "groups keyed by nation and year") {
    val rows = Ext25Queries.tpchQ9(spark, sf).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r =>
      (r.getAs[String]("nation"), r.getAs[Int]("o_year")))
    assert(keys.distinct.length == keys.length, "duplicate (nation, year)")
    rows.foreach { r =>
      val p = r.getAs[Double]("sum_profit")
      assert(!p.isNaN && !p.isInfinite)
    }
  }

  test("Q11: every kept part's value clears 1.5x the cohort mean") {
    val df = Ext25Queries.tpchQ11(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the kept set is strictly above the mean of the FULL per-part value
    // distribution — recompute the threshold from scratch
    val li = Tables.lineitem(spark, sf)
    val cohort = Tables.supplier(spark, sf)
      .filter(col("s_nationkey") < 13).select("s_suppkey")
    val all = li.join(cohort, li("l_suppkey") === cohort("s_suppkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("l_extendedprice").as("c"), sum("l_quantity").as("q"))
      .groupBy("l_partkey").agg(sum(col("c") * col("q")).as("v"))
      .agg(avg("v")).head.getDouble(0)
    rows.foreach(r =>
      assert(r.getAs[Double]("value") > all * 1.49,
        s"${r.getAs[Double]("value")} vs mean $all"))
  }

  test("Q16: Brand#5 excluded, supplier counts positive and bounded by " +
    "the supplier population") {
    val rows = Ext25Queries.tpchQ16(spark, sf).collect()
    assert(rows.nonEmpty)
    val nSupp = Tables.supplier(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[String]("p_brand") != "Brand#5")
      val c = r.getAs[Long]("supplier_cnt")
      assert(c >= 1 && c <= nSupp)
    }
  }

  test("Q20: surviving suppliers come from the >=13 nation cohort and " +
    "each has a 1997-concentrated small part") {
    val rows = Ext25Queries.tpchQ20(spark, sf).collect()
    assert(rows.nonEmpty)
    val cohort = Tables.supplier(spark, sf)
      .filter(col("s_nationkey") >= 13)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(cohort.contains(r.getAs[Long]("s_suppkey"))))
    // no duplicates: the semi-join must not multiply supplier rows
    val ids = rows.map(_.getAs[Long]("s_suppkey"))
    assert(ids.distinct.length == ids.length)
  }
}
