package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext18Queries
import graft.sources.Tables

class Ext18Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("rfm: quintiles balanced, segment encodes the three scores") {
    val rows = Ext18Queries.rfm(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select(countDistinct("o_custkey")).collect()(0).getLong(0)
    assert(rows.length.toLong == nCust)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Int]("r_score"),
        r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
      Seq(rs, fs, ms).foreach(x => assert(x >= 1 && x <= 5))
      assert(r.getAs[String]("segment") == s"$rs$fs$ms")
      assert(r.getAs[Double]("monetary") > 0.0)
      assert(r.getAs[Int]("recency_days") >= 0)
    }
    // ntile(5) keeps bucket sizes within 1 of each other
    val sizes = rows.groupBy(_.getAs[Int]("m_score")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("lpa: every node labelled, labels drawn from the node set") {
    val rows = Ext18Queries.lpaCommunities(spark, sf).collect()
    val nodes = rows.map(_.getAs[String]("node")).toSet
    val labels = rows.map(_.getAs[String]("community")).toSet
    assert(rows.length == nodes.size)
    assert(labels.subsetOf(nodes))
    // communities must compress at least a little on a dense co-purchase
    // graph: strictly fewer labels than nodes
    assert(labels.size < nodes.size)
  }

  test("forecast_backtest: MAEs nonnegative and finite for all streams") {
    val rows = Ext18Queries.forecastBacktest(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (mn, ms) = (r.getAs[Double]("mae_naive"), r.getAs[Double]("mae_sma3"))
      assert(mn >= 0.0 && !mn.isNaN)
      assert(ms >= 0.0 && !ms.isNaN)
      assert(r.getAs[Long]("n_evals") > 0)
    }
  }

  test("rolling_beta: eight tail windows per stream, finite betas") {
    val rows = Ext18Queries.rollingBeta(spark, sf).collect()
    val perType = rows.groupBy(_.getAs[String]("event_type"))
    assert(perType.size == 5)
    perType.values.foreach(hits => assert(hits.length == 8))
    rows.foreach { r =>
      val b = r.getAs[Double]("beta")
      assert(!b.isNaN && !b.isInfinite)
    }
  }

  test("rolling_beta: a stream that IS the market has beta exactly 1") {
    // self-consistency of the moment formula: x == y -> cov/var == 1
    val n = 24L
    val xs = (1 to 24).map(i => i * 1.5)
    val sx = xs.sum; val sxy = xs.map(x => x * x).sum
    val beta = (n * sxy - sx * sx) / (n * sxy - sx * sx)
    assert(beta == 1.0)
  }
}
