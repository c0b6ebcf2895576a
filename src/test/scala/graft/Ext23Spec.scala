package graft

import graft.queries.Ext23Queries

class Ext23Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("sharpe/sortino: finite; sortino >= sharpe in magnitude direction") {
    val rows = Ext23Queries.sharpeSortino(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (sh, so) = (r.getAs[Double]("sharpe"), r.getAs[Double]("sortino"))
      assert(!sh.isNaN && !sh.isInfinite)
      assert(!so.isNaN && !so.isInfinite)
      // downside deviation (0-target, full-count) <= full std only when
      // upside dominates; just pin both to a sane annualized band
      assert(math.abs(sh) < 50 && math.abs(so) < 100)
      assert(r.getAs[Long]("n") > 100)
    }
  }

  test("up/down capture: the equal-weight portfolio's own capture is 1") {
    val rows = Ext23Queries.upDownCapture(spark, sf).collect()
    assert(rows.length == 5)
    // capture ratios average ~1 across the 5 constituents by construction
    val meanUp = rows.map(_.getAs[Double]("up_capture")).sum / 5
    assert(math.abs(meanUp - 1.0) < 0.2, s"mean up-capture $meanUp")
    rows.foreach(r => assert(r.getAs[Long]("n_up_hours") > 0))
  }

  test("drawdown duration: depth in (0,1], durations positive") {
    val rows = Ext23Queries.drawdownDuration(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val dd = r.getAs[Double]("max_drawdown")
      assert(dd > 0.0 && dd <= 1.0)
      assert(r.getAs[Long]("max_underwater_bars") >= 1L)
      assert(r.getAs[Long]("n_spells") >= 1L)
    }
  }

  test("hurst: estimate in a plausible band, both chunk sizes populated") {
    val rows = Ext23Queries.hurst(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val h = r.getAs[Double]("hurst")
      // R/S-estimated H for any real series lands well inside (0, 1.3);
      // random-walk-ish synthetic prices should hover around 0.5
      assert(h > -0.2 && h < 1.3, s"hurst $h implausible")
      assert(r.getAs[Long]("n_chunks_16") > r.getAs[Long]("n_chunks_64"))
    }
  }

  test("information ratio: tracking error positive, IR finite") {
    val rows = Ext23Queries.informationRatio(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("tracking_error") > 0.0)
      val ir = r.getAs[Double]("information_ratio")
      assert(!ir.isNaN && !ir.isInfinite)
    }
  }

  test("VaR/ES: ES at least as severe as VaR, k = ceil(5% of n)") {
    val rows = Ext23Queries.varEs(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (v, es) = (r.getAs[Double]("var_95"), r.getAs[Double]("es_95"))
      // expected shortfall averages the tail BEYOND the VaR cutoff
      assert(es >= v - 1e-9, s"ES $es less severe than VaR $v")
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Int]("k"))
      assert(k >= 1 && k <= n)
      assert(k <= math.ceil(n * 0.05).toInt + 1)
    }
  }

  test("calmar/omega: drawdown in (0,1], omega positive, finite ratios") {
    val rows = Ext23Queries.calmarOmega(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val dd = r.getAs[Double]("max_drawdown")
      assert(dd > 0.0 && dd <= 1.0)
      assert(r.getAs[Double]("omega") > 0.0)
      val c = r.getAs[Double]("calmar")
      assert(!c.isNaN && !c.isInfinite)
    }
  }

  test("pairs spread: only divergence hours survive (|z| > 1.5), z finite") {
    val rows = Ext23Queries.pairsSpread(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(math.abs(z) > 1.5 - 1e-9)
      assert(!z.isNaN && !z.isInfinite)
      assert(!r.getAs[Double]("spread").isNaN)
    }
  }

  test("turnover: one audit row, 0 < avg <= max <= 1") {
    val rows = Ext23Queries.turnover(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_days") > 0)
    val (a, m) = (r.getAs[Double]("avg_turnover"), r.getAs[Double]("max_turnover"))
    // turnover = half the L1 weight change: bounded by 1 by construction
    assert(a > 0.0 && a <= m && m <= 1.0)
  }

  test("jensen alpha: betas average ~1 against the equal-weight market") {
    val rows = Ext23Queries.jensenAlpha(spark, sf).collect()
    assert(rows.length == 5)
    val meanBeta = rows.map(_.getAs[Double]("beta")).sum / 5
    // the market IS the average of the 5 series, so cross-sectional mean
    // beta is ~1 (not exactly: per-symbol join drops differ)
    assert(math.abs(meanBeta - 1.0) < 0.25, s"mean beta $meanBeta")
    rows.foreach { r =>
      val a = r.getAs[Double]("jensen_alpha")
      assert(!a.isNaN && !a.isInfinite)
    }
  }
}
