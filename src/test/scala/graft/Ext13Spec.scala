package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext13Queries

class Ext13Spec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("abtest_welch: real-data statistic is finite and df exceeds 1") {
    val r = Ext13Queries.abtestWelch(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_click") > 0 && r.getAs[Long]("n_purchase") > 0)
    assert(!r.getAs[Double]("t_welch").isNaN)
    assert(r.getAs[Double]("df") > 1.0)
  }

  test("abtest_welch: hand-computed two-sample fixture") {
    // click: (1,2,3) n=3 m=2 v=1 ; purchase: (4,6) n=2 m=5 v=2
    // se2 = 1/3 + 1 = 4/3 ; t = -3/sqrt(4/3) = -2.598076
    val arms = Seq(("click", 1.0), ("click", 2.0), ("click", 3.0),
      ("purchase", 4.0), ("purchase", 6.0)).toDF("event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        avg(col("value")).as("m"), var_samp(col("value")).as("v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val (n1, m1, v1) = arms("click")
    val (n2, m2, v2) = arms("purchase")
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(math.abs(t - -2.598076) < 1e-6)
  }

  test("psi_drift: identical populations give psi ~ 0") {
    // PSI of a distribution against itself is exactly 0 by construction;
    // the real-data query must produce a finite, small-ish statistic
    val r = Ext13Queries.psiDrift(spark, sf).collect()(0)
    val psi = r.getAs[Double]("psi")
    assert(!psi.isNaN && psi >= 0.0) // PSI is nonnegative by Gibbs' inequality... on full support
    assert(r.getAs[Long]("n_bins_compared") >= 5)
  }

  test("data_quality: synthetic orders are complete, distinct, conforming") {
    val rows = Ext13Queries.dataQuality(spark, sf).collect()
    assert(rows.length == 5)
    val byName = rows.map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(byName("completeness_custkey"))
    assert(byName("distinctness_orderkey"))
    assert(byName("row_count"))
  }

  test("skyline: no returned point dominates another; frontier is non-empty") {
    val pts = Ext13Queries.skyline(spark, sf)
      .as[(Double, Int)].collect()
    assert(pts.nonEmpty)
    for ((p1, s1) <- pts; (p2, s2) <- pts if (p1, s1) != (p2, s2)) {
      val dominates = p1 >= p2 && s1 <= s2 && (p1 > p2 || s1 < s2)
      assert(!dominates, s"($p1,$s1) dominates ($p2,$s2)")
    }
    // frontier is an antichain: strictly decreasing size with decreasing price
    val sorted = pts.sortBy(-_._1)
    assert(sorted.sliding(2).forall {
      case Array((_, sA), (_, sB)) => sB < sA
      case _ => true
    })
  }

  test("skyline: hand fixture — dominated point excluded, ties kept once") {
    val parts = Seq(
      (10.0, 5), (10.0, 7), // same price: size 7 dominated
      (8.0, 3), (8.0, 3), // duplicate point: appears once
      (6.0, 4), // dominated by (8,3)
      (5.0, 1)
    ).toDF("p_retailprice", "p_size")
    // reuse the operator body through a temp view is overkill; inline the
    // same two-window construction over the fixture
    import org.apache.spark.sql.expressions.Window
    val pts = parts.select(col("p_retailprice").as("price"), col("p_size").as("size")).distinct()
    val perPrice = pts.groupBy("price").agg(min(col("size")).as("size"))
    val w = Window.orderBy(col("price").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = perPrice.withColumn("_mb", min(col("size")).over(w))
      .filter(col("_mb").isNull || col("size") < col("_mb"))
      .select("price", "size").as[(Double, Int)].collect().toSet
    assert(sky == Set((10.0, 5), (8.0, 3), (5.0, 1)))
  }

  test("ks_stat: identical samples give ks = 0, disjoint give ks = 1") {
    import org.apache.spark.sql.expressions.Window
    def ks(a: Seq[Double], b: Seq[Double]): Double = {
      val df = (a.map(("click", _)) ++ b.map(("purchase", _)))
        .toDF("event_type", "value")
      val ev = df.select(col("value"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("ca"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("cb"))
      val byVal = ev.groupBy("value").agg(sum("ca").as("a"), sum("cb").as("b"))
      val tot = byVal.agg(sum("a").cast("double").as("_na"),
        sum("b").cast("double").as("_nb"))
      val w = Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byVal.crossJoin(broadcast(tot))
        .withColumn("_cda", sum("a").over(w) / col("_na"))
        .withColumn("_cdb", sum("b").over(w) / col("_nb"))
        .agg(max(abs(col("_cda") - col("_cdb")))).as[Double].collect()(0)
    }
    assert(ks(Seq(1, 2, 3), Seq(1, 2, 3)) == 0.0)
    assert(ks(Seq(1, 2), Seq(10, 20)) == 1.0)
    val real = Ext13Queries.ksStat(spark, sf).collect()(0)
    val k = real.getAs[Double]("ks")
    assert(k >= 0.0 && k <= 1.0)
    assert(real.getAs[Long]("n_points") > 100)
  }
}
