package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext30Queries
import graft.sources.Tables

/** Semantic invariants for the weighted-median / interval-union batch. */
class Ext30Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("weighted median: sits inside the value range and splits the " +
    "weight mass at half or more on both sides") {
    val rows = Ext30Queries.weightedPercentile(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val med = r.getAs[Double]("weighted_median")
      val part = li.filter(col("l_returnflag") === flag)
      val (lo, hi) = {
        val mm = part.agg(min("l_extendedprice"), max("l_extendedprice")).head
        (mm.getDouble(0), mm.getDouble(1))
      }
      assert(med >= lo && med <= hi)
      // the defining property: weight at-or-below the median >= half
      val below = part.filter(col("l_extendedprice") <= med)
        .agg(sum("l_quantity")).head.getDouble(0)
      assert(below * 2 >= r.getAs[Double]("total_weight") - 1e-6,
        s"$flag: $below below vs total ${r.getAs[Double]("total_weight")}")
    }
  }

  test("interval coverage: merged time bounded by [one span, n*span], " +
    "span counts bounded by event counts, no double counting") {
    val rows = Ext30Queries.intervalCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val span = 1800000000L
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val (n, cov) = (r.getAs[Long]("n_spans"), r.getAs[Long]("covered_us"))
      assert(n >= 1 && n <= perUser(u))
      assert(cov >= span, s"user $u covered less than one span")
      assert(cov <= perUser(u) * span,
        s"user $u covered more than the unmerged total — double counting")
    }
    assert(rows.length == perUser.size)
  }
}
