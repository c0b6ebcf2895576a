package graft

import graft.queries.Ext28Queries
import graft.sources.Tables

/** Semantic invariants for the label-quality / density batch. */
class Ext28Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("knn classify: per-label audit partitions the corpus, accuracy " +
    "beats the 10-class random floor overall") {
    val rows = Ext28Queries.knnClassify(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "every vector must receive exactly one prediction")
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n"), r.getAs[Long]("n_correct"))
      assert(c >= 0 && c <= n)
    }
    val acc = rows.map(_.getAs[Long]("n_correct")).sum.toDouble / total
    // the synthetic labels are NOT spatially clustered, so the audit's
    // correct verdict is ~the 10-class random floor — pin that it reports
    // a plausible floor value rather than degenerate 0 or 1
    assert(acc > 0.02 && acc < 0.4, s"overall accuracy $acc implausible")
  }

  test("stickiness: dau <= mau, ratio in (0,1], only full 28d windows") {
    val rows = Ext28Queries.stickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, mau) = (r.getAs[Long]("dau"), r.getAs[Long]("mau"))
      assert(dau >= 1 && dau <= mau)
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
    }
    // anchors are consecutive days: no partial-window gaps inside the span
    val days = rows.map(_.getAs[Long]("day_no")).sorted
    assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
  }

  test("dbscan core: shares in [0,1], totals rebuild the corpus, and the " +
    "clustered labels have SOME core points") {
    val rows = Ext28Queries.dbscanCore(spark, sf).collect()
    assert(rows.length == 10)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_points")).sum == total)
    rows.foreach { r =>
      val (np, nc) = (r.getAs[Long]("n_points"), r.getAs[Long]("n_core"))
      assert(nc >= 0 && nc <= np)
      val sh = r.getAs[Double]("core_share")
      assert(sh >= 0.0 && sh <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_core")).sum > 0,
      "epsilon/minPts find no density at all — grid mis-sized")
  }
}
