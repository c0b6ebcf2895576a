package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext16Queries
import graft.sources.Tables

class Ext16Spec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("assoc_rules: both rule directions share support; confidence and " +
      "lift are consistent") {
    val rows = Ext16Queries.assocRules(spark, sf).collect()
    assert(rows.nonEmpty)
    // the directed expansion emits A->B and B->A for every surviving pair
    assert(rows.length % 2 == 0)
    val bySupport = rows.groupBy(r =>
      Set(r.getAs[String]("antecedent"), r.getAs[String]("consequent")))
    bySupport.values.foreach { pair =>
      assert(pair.map(_.getAs[Double]("support")).distinct.length == 1)
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("support") >= 0.01)
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("item_similarity: top-3 per item, cosine within [0, 1]") {
    val rows = Ext16Queries.itemSimilarity(spark, sf).collect()
    val perItem = rows.groupBy(_.getAs[String]("item"))
    perItem.values.foreach { hits =>
      assert(hits.length <= 3)
      assert(hits.map(_.getAs[Int]("rank")).sorted
        .sameElements(1 to hits.length))
    }
    rows.foreach { r =>
      val cos = r.getAs[Double]("cos")
      // purchase-count vectors are nonnegative, so cosine is too
      assert(cos >= 0.0 && cos <= 1.0 + 1e-9)
    }
  }

  test("candle_patterns: only the two declared patterns, no duplicates") {
    val rows = Ext16Queries.candlePatterns(spark, sf).collect()
    assert(rows.nonEmpty)
    val pats = rows.map(_.getAs[String]("pattern")).toSet
    assert(pats.subsetOf(Set("bullish_engulfing", "doji")))
    val keys = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("hr_us"), r.getAs[String]("pattern")))
    assert(keys.distinct.length == keys.length)
  }

  test("twap: interval-weighted mean lies inside each stream's value range") {
    val bounds = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val out = Ext16Queries.twap(spark, sf)
      .join(bounds, "event_type").collect()
    assert(out.length == 5)
    out.foreach { r =>
      val t = r.getAs[Double]("twap")
      assert(t >= r.getAs[Double]("lo") - 1e-6 &&
        t <= r.getAs[Double]("hi") + 1e-6)
      assert(r.getAs[Long]("n_intervals") > 0)
    }
  }

  test("gini: real-data coefficient in [0, 1); equal incomes give zero") {
    val r = Ext16Queries.gini(spark, sf).collect()(0)
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    val nCust = Tables.orders(spark, sf)
      .select(countDistinct("o_custkey")).collect()(0).getLong(0)
    assert(r.getAs[Long]("n_cust") == nCust)
    // closed form sanity: x_i all equal -> 2*sum(i*x) = (n+1)*sum(x) -> G = 0
    val n = 5
    val twoSumIx = 2L * (1 to n).map(_ * 10L).sum
    assert(twoSumIx == (n + 1) * n * 10L)
  }

  test("km_survival: survival curve is monotone non-increasing from <= 1") {
    val rows = Ext16Queries.kmSurvival(spark, sf).collect()
      .sortBy(_.getAs[Long]("dur_days"))
    assert(rows.nonEmpty)
    val survs = rows.map(_.getAs[Double]("surv"))
    assert(survs.head <= 1.0 + 1e-9)
    assert(survs.zip(survs.tail).forall { case (a, b) => b <= a + 1e-9 })
    val risks = rows.map(_.getAs[Long]("n_at_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => b <= a })
    rows.foreach { r =>
      assert(r.getAs[Long]("d") >= 1)
      assert(r.getAs[Long]("d") <= r.getAs[Long]("n_at_risk"))
    }
  }

  test("autocorr: one coefficient per stream, bounded by [-1, 1]") {
    val rows = Ext16Queries.autocorr(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val r1 = r.getAs[Double]("r1")
      assert(r1 >= -1.0 - 1e-9 && r1 <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_pairs") > 1)
    }
  }
}
