package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Indicators
import graft.operators.Indicators.SeriesSpec

/** Pins the reference semantics from SURVEY.md §3.1 on hand-computed
  * mini-series: warm-up partial windows emit values, RSI divide-by-zero yields
  * NULL (and is dropped by the long-shape null filter), stddev of a single row
  * is NULL, gains/losses at partition starts are 0.0.
  */
class IndicatorsSpec extends SparkTestBase {
  import spark.implicits._

  private val spec = SeriesSpec(Seq("k"), Seq("t"), "p", n = 3)

  private def series(points: (String, Int, Double)*) =
    points.toDF("k", "t", "p")

  test("SMA emits partial-window values during warm-up (reference spark_job_1.py:28)") {
    val out = series(("a", 1, 2.0), ("a", 2, 4.0), ("a", 3, 9.0), ("a", 4, 5.0))
      .withColumn("sma", Indicators.smaCol(spec))
      .orderBy("t").select("sma").as[Double].collect()
    assert(out.toSeq == Seq(2.0, 3.0, 5.0, 6.0)) // avg over 1, 2, 3, 3 rows
  }

  test("RSI: mixed gains/losses, hand-computed (Cutler's method)") {
    // prices 10, 12, 11 -> diffs: null, +2, -1
    // row3 frame: gains (0, 2, 0) avg=2/3; losses (0, 0, 1) avg=1/3; rs=2 -> RSI=100-100/3
    val out = series(("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 11.0))
      .withColumn("rsi", Indicators.rsiCol(spec))
      .orderBy("t").select("rsi").collect()
    assert(out(0).isNullAt(0)) // frame all-zero gains AND losses -> ÷0 -> NULL
    assert(out(1).isNullAt(0)) // only gains, avg_loss=0 -> NULL (NOT 100)
    assert(math.abs(out(2).getDouble(0) - (100.0 - 100.0 / 3.0)) < 1e-12)
  }

  test("RSI on a flat series is NULL everywhere (÷0, reference P4 drops these rows)") {
    val out = series(("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 5.0), ("a", 4, 5.0))
      .withColumn("rsi", Indicators.rsiCol(spec))
      .select("rsi").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("Bollinger: NULL on single-row frame (sample stddev), mean±2σ after") {
    val out = series(("a", 1, 1.0), ("a", 2, 3.0))
      .withColumn("up", Indicators.bollingerUpCol(spec))
      .withColumn("dn", Indicators.bollingerDownCol(spec))
      .orderBy("t").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("up")))
    // mean=2, stddev_samp([1,3]) = sqrt(2)
    assert(math.abs(out(1).getDouble(out(1).fieldIndex("up")) - (2 + 2 * math.sqrt(2))) < 1e-12)
    assert(math.abs(out(1).getDouble(out(1).fieldIndex("dn")) - (2 - 2 * math.sqrt(2))) < 1e-12)
  }

  test("allLong: 4 branches, null rows filtered, per-partition isolation") {
    val df = series(
      ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
      ("b", 1, 7.0))
    val out = Indicators.allLong(df, spec)
    val byType = out.groupBy("type_name").count().as[(String, Long)].collect().toMap
    // SMA: all 4 rows. BB: stddev null on first row of each partition -> 2 each.
    // RSI: strictly-rising 'a' has avg_loss=0 -> all NULL; 'b' single row NULL.
    assert(byType("SMA") == 4)
    assert(byType.getOrElse("RSI", 0L) == 0)
    assert(byType("BB_UP") == 2 && byType("BB_DOWN") == 2)
    // partition b never sees partition a's values
    val bSma = out.filter($"k" === "b" && $"type_name" === "SMA")
      .select("value").as[Double].head()
    assert(bSma == 7.0)
  }

  test("wide single-pass all() agrees with independently-computed columns") {
    val df = series(("a", 1, 3.0), ("a", 2, 1.0), ("a", 3, 4.0), ("a", 4, 1.0),
      ("a", 5, 5.0), ("a", 6, 9.0))
    val wide = Indicators.all(df, spec).orderBy("t")
    val sep = df
      .withColumn("sma2", Indicators.smaCol(spec))
      .withColumn("rsi2", Indicators.rsiCol(spec))
      .withColumn("up2", Indicators.bollingerUpCol(spec))
      .orderBy("t")
    val a = wide.select("sma", "rsi", "bb_up").collect()
    val b = sep.select("sma2", "rsi2", "up2").collect()
    assert(a.zip(b).forall { case (x, y) => x.toString == y.toString })
  }
}
