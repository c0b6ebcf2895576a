package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext22Queries

class Ext22Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("streaks: up and down maxima positive, runs bounded by bar count") {
    val rows = Ext22Queries.streaks(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_up_streak") >= 1L)
      assert(r.getAs[Long]("max_down_streak") >= 1L)
      assert(r.getAs[Long]("n_up_runs") >= 1L)
    }
  }

  test("streaks: hand-checkable series via the same islands idiom") {
    import spark.implicits._
    // closes 1,2,3,1,2 -> ups at idx 2,3 (1->2,2->3), down at 4 (3->1), up at 5
    // up flags: 0,1,1,0,1 -> max up streak 2, max down streak 1 (the two
    // 0-flag bars are separate runs: bar1 [no prev] and bar4)
    Seq((1, 1.0), (2, 2.0), (3, 3.0), (4, 1.0), (5, 2.0))
      .toDF("i", "close").createOrReplaceTempView("tiny_streak")
    val out = spark.sql(
      """WITH d AS (
        |  SELECT CASE WHEN close > lag(close) OVER (ORDER BY i)
        |    THEN 1 ELSE 0 END AS up,
        |    CAST(row_number() OVER (ORDER BY i) AS BIGINT) AS rn
        |  FROM tiny_streak
        |), isl AS (
        |  SELECT up, rn - CAST(row_number() OVER (PARTITION BY up ORDER BY rn)
        |    AS BIGINT) AS grp FROM d
        |), runs AS (SELECT up, grp, COUNT(*) AS len FROM isl GROUP BY up, grp)
        |SELECT MAX(CASE WHEN up = 1 THEN len ELSE 0 END) AS mu,
        |  MAX(CASE WHEN up = 0 THEN len ELSE 0 END) AS md FROM runs""".stripMargin)
      .collect().head
    assert(out.getAs[Long]("mu") == 2L)
    assert(out.getAs[Long]("md") == 1L)
  }

  test("seasonality: shares sum to 1 per stream, index averages to ~1") {
    val rows = Ext22Queries.seasonality(spark, sf).collect()
    val perType = rows.groupBy(_.getAs[String]("event_type"))
    assert(perType.size == 5)
    perType.values.foreach { cells =>
      val share = cells.map(_.getAs[Double]("cell_share")).sum
      assert(math.abs(share - 1.0) < 1e-3, s"shares sum to $share")
      cells.foreach(c => assert(c.getAs[Double]("seasonal_index") > 0.0))
    }
  }

  test("silhouette: values in [-1, 1], all labels present") {
    val rows = Ext22Queries.silhouette(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s0 = r.getAs[Double]("mean_silhouette")
      assert(s0 >= -1.0 && s0 <= 1.0, s"silhouette $s0 out of range")
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("js divergence: bounded to [0, 1] bits, all sources scored") {
    val rows = Ext22Queries.jsDivergence(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val js = r.getAs[Double]("js_vs_corpus")
      assert(js >= 0.0 && js <= 1.0, s"JS $js outside [0,1] bits")
    }
  }

  test("portfolio variance: positive, diversification ratio >= 1") {
    val r = Ext22Queries.portfolioVar(spark, sf).collect().head
    assert(r.getAs[Double]("portfolio_var") > 0.0)
    // averaging imperfectly correlated assets can't increase risk:
    // sum w_i sigma_i >= sigma_p (equality iff perfect correlation)
    assert(r.getAs[Double]("diversification_ratio") >= 1.0 - 1e-9)
    assert(r.getAs[Int]("n_assets") == 5)
  }

  test("jarque-bera: statistic nonnegative and consistent with its moments") {
    val rows = Ext22Queries.jarqueBera(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (sk, ku, jb, n) = (r.getAs[Double]("skew"), r.getAs[Double]("ex_kurt"),
        r.getAs[Double]("jarque_bera"), r.getAs[Long]("n"))
      assert(jb >= 0.0)
      val expect = n / 6.0 * (sk * sk + ku * ku / 4)
      assert(math.abs(jb - expect) < 0.01 * math.max(1.0, expect),
        s"JB $jb vs recomputed $expect")
    }
  }
}
