package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext21Queries

class Ext21Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("auc: in [0,1]; a random-ish scorer lands near 0.5") {
    val r = Ext21Queries.aucRoc(spark, sf).collect().head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // l_discount does not actually predict returns in synthetic data —
    // the rank-sum algebra should therefore sit near chance level
    assert(math.abs(auc - 0.5) < 0.15, s"auc $auc suspiciously far from chance")
    assert(r.getAs[Long]("n_pos") > 0 && r.getAs[Long]("n_neg") > 0)
  }

  test("auc: hand-computed tiny case via the same rank-sum identity") {
    // scores: pos {0.9, 0.7}, neg {0.8, 0.1} -> pairs: (0.9 beats both)=2,
    // (0.7 beats 0.1)=1 -> U=3 of 4 -> AUC=0.75
    import spark.implicits._
    Seq((0.9, 1), (0.7, 1), (0.8, 0), (0.1, 0))
      .toDF("score", "y").createOrReplaceTempView("li_auc_tiny")
    val df = spark.sql(
      """WITH h AS (
        |  SELECT score, CAST(SUM(y) AS BIGINT) AS n1,
        |    CAST(SUM(1 - y) AS BIGINT) AS n0
        |  FROM li_auc_tiny GROUP BY score
        |), c AS (
        |  SELECT score, n1, n0,
        |    CAST(SUM(n0) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n0 AS BIGINT)
        |      AS cum0_below
        |  FROM h
        |)
        |SELECT CAST(SUM(n1 * (2 * cum0_below + n0)) AS DOUBLE)
        |  / (2 * CAST(SUM(n1) AS DOUBLE) * CAST(SUM(n0) AS DOUBLE)) AS auc
        |FROM c""".stripMargin)
    assert(df.collect().head.getAs[Double]("auc") == 0.75)
  }

  test("calibration: observed rates in [0,1], Brier in [0,1], mass conserved") {
    val rows = Ext21Queries.calibrationBins(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == graft.sources.Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      val obs = r.getAs[Double]("obs_rate")
      assert(obs >= 0.0 && obs <= 1.0)
      val bs = r.getAs[Double]("brier_global")
      assert(bs >= 0.0 && bs <= 1.0)
    }
  }

  test("lift: capture monotone to 1.0, first-decile lift >= last cumulative") {
    val rows = Ext21Queries.liftCurve(spark, sf)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    val caps = rows.map(_.getAs[Double]("cum_capture"))
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(math.abs(caps.last - 1.0) < 1e-9)
    assert(math.abs(rows.last.getAs[Double]("cum_lift") - 1.0) < 1e-9)
  }

  test("kalman: posterior variance converges below the prior, estimate finite") {
    val rows = Ext21Queries.kalman1d(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (x, p) = (r.getAs[Double]("x_est"), r.getAs[Double]("p_est"))
      assert(!x.isNaN && !x.isInfinite)
      // steady-state POSTERIOR variance of the (q=0.1, r=1) random walk:
      // prior u* = (q + sqrt(q^2 + 4qr))/2 ~ 0.370156, posterior
      // p* = u*r/(u*+r) ~ 0.270156; after hundreds of bars the recursion
      // must have converged to it from p0 = 1
      assert(p > 0.0 && p < 1.0)
      assert(math.abs(p - 0.27015621) < 1e-3, s"p $p not at steady state")
      assert(r.getAs[Int]("n_bars") > 100)
    }
  }

  test("2-core: flags are 0/1 and core nodes keep degree >= 2 within the core") {
    val rows = Ext21Queries.twoCore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(Set(0, 1)(r.getAs[Int]("in_2core"))))
    // dense trade graph: the 2-core must be non-empty
    assert(rows.count(_.getAs[Int]("in_2core") == 1) >= 3)
  }

  test("entity blocking: matches never exceed candidates, blocks non-trivial") {
    val rows = Ext21Queries.entityBlocking(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matches") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("n_pairs") >= 1L)
    }
  }
}
