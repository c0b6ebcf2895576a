package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext15Queries
import graft.sources.Tables

class Ext15Spec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ewma: result lies inside each user's value range (convexity)") {
    val bounds = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val out = Ext15Queries.ewma(spark, sf).join(bounds, "user_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val e = r.getAs[Double]("ewma")
      // round(_, 6) can nudge past the exact bound by at most 5e-7
      assert(e >= r.getAs[Double]("lo") - 1e-6 &&
        e <= r.getAs[Double]("hi") + 1e-6)
      assert(r.getAs[Int]("n_events") > 0)
    }
  }

  test("ewma: hand-computed fold (10, 20, 15 at alpha 0.2 -> 12.6)") {
    // e1 = 10; e2 = .2*20 + .8*10 = 12; e3 = .2*15 + .8*12 = 12.6
    val vals = typedLit(Seq(10.0, 20.0, 15.0)).as("vals")
    val folded = spark.range(1).select(
      aggregate(slice(vals, lit(2), lit(2)), element_at(vals, 1),
        (acc, v) => lit(0.2) * v + lit(0.8) * acc).as("e"))
      .collect()(0).getDouble(0)
    assert(math.abs(folded - 12.6) < 1e-12)
  }

  test("drawdown: ratios in [0, 1) and one row per ordering customer") {
    val out = Ext15Queries.drawdown(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select(countDistinct("o_custkey")).collect()(0).getLong(0)
    assert(out.length.toLong == nCust)
    out.foreach { r =>
      val dd = r.getAs[Double]("max_drawdown")
      assert(dd >= 0.0 && dd < 1.0)
      assert(r.getAs[Long]("n_orders") > 0)
    }
  }

  test("markov_transitions: each source row is a probability distribution") {
    val rows = Ext15Queries.markovTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      assert(p > 0.0 && p <= 1.0)
    }
    val rowSums = rows.groupBy(_.getAs[String]("prev_type"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("p")).sum }
    // round(p, 6) per cell; <= 5 cells per row
    rowSums.foreach(sum => assert(math.abs(sum - 1.0) < 5e-6))
  }

  test("chi_square: nonnegative statistic with independently derived dof") {
    val r = Ext15Queries.chiSquare(spark, sf).collect()(0)
    val docs = Tables.documents(spark, sf)
    val nl = docs.select(countDistinct("lang")).collect()(0).getLong(0)
    val ns = docs.select(countDistinct("source")).collect()(0).getLong(0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Int]("dof") == ((nl - 1) * (ns - 1)).toInt)
    assert(r.getAs[Long]("n") == docs.count())
  }

  test("mann_whitney: U within [0, n1*n2] and z finite") {
    val r = Ext15Queries.mannWhitney(spark, sf).collect()(0)
    val n1 = r.getAs[Long]("n1")
    val n2 = r.getAs[Long]("n2")
    val u1 = r.getAs[Double]("u1")
    assert(n1 > 0 && n2 > 0)
    assert(u1 >= 0.0 && u1 <= n1.toDouble * n2)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("mann_whitney: midrank algebra matches the textbook tied example") {
    // click = (5, 5), purchase = (5): everything tied at value 5.
    // midrank = 2 for all three -> R1 = 4 -> U1 = R1 - n1(n1+1)/2 = 1,
    // which equals n1*n2/2 — the no-information point.
    val byVal = Seq(("click", 5.0), ("click", 5.0), ("purchase", 5.0))
      .toDF("event_type", "value")
      .groupBy("value")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cnt1"))
      .withColumn("cumlt", lit(0L))
      .agg(sum(col("cnt1") * (lit(2) * col("cumlt") + col("cnt") + 1))
        .as("two_r1"), sum("cnt1").as("n1"))
      .collect()(0)
    val twoR1 = byVal.getAs[Long]("two_r1")
    val n1 = byVal.getAs[Long]("n1")
    assert((twoR1 - n1 * (n1 + 1)) / 2.0 == 1.0)
  }

  test("benford: digits 1..9 and both share columns sum to one") {
    val rows = Ext15Queries.benford(spark, sf).collect()
    val digits = rows.map(_.getAs[Int]("lead_digit")).sorted
    assert(digits.forall(d => d >= 1 && d <= 9))
    val obsSum = rows.map(_.getAs[Double]("obs_share")).sum
    val expSum = rows.map(_.getAs[Double]("exp_share")).sum
    assert(math.abs(obsSum - 1.0) < 1e-5)
    // sum_d log10(1 + 1/d) telescopes to log10(10) = 1 over the full support
    if (digits.length == 9) assert(math.abs(expSum - 1.0) < 1e-5)
  }

  test("kmeans_step: assignment partitions the corpus; seeds stay home") {
    val rows = Ext15Queries.kmeansStep(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.length <= 8)
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_dist") >= 0.0)
      // a seed's distance to itself is 0, so every emitted cluster of a
      // seed contains at least that seed
      assert(r.getAs[Long]("n") >= 1)
    }
  }

  test("rrf_fusion: five fused hits per query, scores within (0, 2/61]") {
    val rows = Ext15Queries.rrfFusion(spark, sf).collect()
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.size == 10)
    perQuery.values.foreach(hits => assert(hits.length == 5))
    rows.foreach { r =>
      val rrf = r.getAs[Double]("rrf")
      // round(_, 6) can push the reported score up to 5e-7 past 2/61
      assert(rrf > 0.0 && rrf <= 2.0 / 61 + 1e-6)
      assert(r.getAs[Int]("rank_cos") >= 1 && r.getAs[Int]("rank_l1") >= 1)
    }
  }

  test("bigram_lm: all scores negative; bigram totals match token counts") {
    val rows = Ext15Queries.bigramLm(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("avg_logp") < 0.0))
    val expected = Tables.documents(spark, sf)
      .select(greatest(size(split(lower(col("text")), " ")) - 1, lit(0))
        .as("nb"))
      .agg(sum("nb")).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_bigrams")).sum == expected)
  }

  test("lorenz_share: cumulative share is monotone and ends at 1") {
    val rows = Ext15Queries.lorenzShare(spark, sf).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(cums.last - 1.0) < 1e-6)
    // revenue-desc ranking: the top decile holds at least its pro-rata share
    val shares = rows.map(_.getAs[Double]("decile_share"))
    assert(shares.head >= shares.last)
    assert(math.abs(shares.sum - 1.0) < 1e-5)
  }
}
