package graft

import org.apache.spark.sql.{Encoders, functions => F}

import graft.functions.TopKAgg
import graft.queries.Ext24Queries

class TopKAggSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("aggregator semantics: reduce/merge keep the exact (ord desc, id asc) top-k") {
    val agg = new TopKAgg(3)
    val items = Seq((5.0, 10L), (7.0, 2L), (5.0, 3L), (9.0, 9L), (1.0, 1L), (7.0, 1L))
    // sequential reduce
    val seq = items.foldLeft(agg.zero)(agg.reduce)
    assert(seq.toSeq == Seq((9.0, 9L), (7.0, 1L), (7.0, 2L)))
    // arbitrary split + merge must agree (associativity/commutativity)
    for (cut <- 1 until items.length) {
      val (l, r) = items.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m.toSeq == seq.toSeq, s"split at $cut diverged")
      val m2 = agg.merge(r.foldLeft(agg.zero)(agg.reduce),
        l.foldLeft(agg.zero)(agg.reduce))
      assert(m2.toSeq == seq.toSeq, s"commuted split at $cut diverged")
    }
  }

  test("round-14: NaN ord never enters the buffer (it is unordered under " +
      "the beats comparator and would wedge the sorted invariant)") {
    val agg = new TopKAgg(3)
    val items = Seq((Double.NaN, 7L), (5.0, 1L), (Double.NaN, 8L), (9.0, 2L))
    val seq = items.foldLeft(agg.zero)(agg.reduce)
    assert(seq.toSeq == Seq((9.0, 2L), (5.0, 1L)))
    // split/merge agrees even when one side saw only NaNs
    val nanOnly = Seq((Double.NaN, 7L)).foldLeft(agg.zero)(agg.reduce)
    val rest = Seq((5.0, 1L), (9.0, 2L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(nanOnly, rest).toSeq == Seq((9.0, 2L), (5.0, 1L)))
  }

  test("round-14: degenerate parameters throw at construction, not at " +
      "buf(-1) deep inside a job") {
    intercept[IllegalArgumentException](new TopKAgg(0))
    intercept[IllegalArgumentException](new graft.functions.MinHashAgg(0))
    intercept[IllegalArgumentException](
      new graft.functions.CountMinSketchAgg(depth = 0))
  }

  test("groups smaller than k emit all rows, ordered") {
    val agg = new TopKAgg(5)
    val out = Seq((2.0, 2L), (1.0, 1L)).foldLeft(agg.zero)(agg.reduce)
    assert(out.toSeq == Seq((2.0, 2L), (1.0, 1L)))
  }

  test("q_topk_agg matches the window formulation on real data") {
    val fast = Ext24Queries.topkAgg(spark, sf)
    val win = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc, F.col("o_orderkey"))
      graft.sources.Tables.orders(spark, sf)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
    }
    assert(fast.exceptAll(win).isEmpty && win.exceptAll(fast).isEmpty,
      "TopKAgg result differs from the window top-k")
  }

  test("plan: partial ObjectHashAggregate before the shuffle, no WindowExec") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Ext24Queries.topkAgg(spark, sf).queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, "top-k fell back to a window sort")
      val objAggs = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      }
      assert(objAggs.size >= 2, "top-k buffer not partial-aggregated map-side")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
