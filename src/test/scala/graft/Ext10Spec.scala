package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext10Queries

class Ext10Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("ohlc candles: open/close inside [low, high], n sums to event count") {
    val out = Ext10Queries.ohlcResample(spark, sf)
    val bad = out.filter(
      col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low") ||
      col("low") > col("high"))
    assert(bad.count() == 0)
    val n = out.agg(sum("n")).collect()(0).getLong(0)
    assert(n == graft.sources.Tables.events(spark, sf).count())
  }

  test("vwap lies within the day's price envelope and volumes are positive") {
    val out = Ext10Queries.vwap(spark, sf)
    val env = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        date_format(to_date(timestamp_micros(col("ts_us"))), "yyyy-MM-dd").as("day"))
      .agg(min("value").as("lo"), max("value").as("hi"))
    val j = out.join(env, Seq("event_type", "day"))
    assert(j.count() == out.count())
    val bad = j.filter(col("vwap") < col("lo") - 0.01 || col("vwap") > col("hi") + 0.01)
    assert(bad.count() == 0, "vwap escaped the [min,max] price envelope")
    assert(out.filter(col("vol") <= 0).count() == 0)
  }

  test("prefix-filtered jaccard join equals the exact postings self-join") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val exact = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pref = graft.operators.Dedup.jaccardPrefixPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pref.keySet == exact.keySet,
      s"prefix filter lost/added pairs: only-exact=${exact.keySet -- pref.keySet} " +
        s"only-prefix=${pref.keySet -- exact.keySet}")
    pref.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-12) }
  }

  test("rolling HLL estimate within 5% of exact everywhere at this scale") {
    val out = Ext10Queries.rollingHll(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getBoolean(3),
      s"sketch off by >5% at ${r.getString(0)}/${r.getString(1)} exact=${r.getLong(2)}"))
  }
}
