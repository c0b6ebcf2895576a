package graft

import graft.queries.Ext29Queries
import graft.sources.Tables

/** Semantic invariants for the retrieval-eval / label-construction batch. */
class Ext29Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("retrieval eval: metrics in [0,1], ndcg >= precision (discounted " +
    "gain can only help a fixed hit set), queries partition the corpus") {
    val rows = Ext29Queries.retrievalEval(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_queries")).sum == total)
    rows.foreach { r =>
      val (p, m, n) = (r.getAs[Double]("precision_at_5"),
        r.getAs[Double]("mrr"), r.getAs[Double]("ndcg_at_5"))
      assert(p >= 0.0 && p <= 1.0)
      assert(m >= 0.0 && m <= 1.0)
      assert(n >= 0.0 && n <= 1.0)
      // with binary gains over the SAME retrieved set, the ideal ranking
      // dominates the actual one, and ndcg >= p@5 for every query
      assert(n >= p - 1e-9, s"ndcg $n below precision $p")
      // any hit at all implies a positive reciprocal rank
      if (p > 0) assert(m > 0)
    }
  }

  test("churn features: classes partition subscriptions, observation-" +
    "window features only (no holdout leakage in volumes)") {
    val rows = Ext29Queries.churnFeatures(spark, sf).collect()
    assert(rows.length == 2, "expected exactly churned + retained classes")
    val by = rows.map(r => r.getAs[Int]("churned") -> r).toMap
    assert(by.keySet == Set(0, 1))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_subs") > 0)
      assert(r.getAs[Double]("avg_active_days") > 0.0)
    }
    // churn is the minority class (synthetic activity is dense; nothing
    // behavioral distinguishes the classes, so no feature-mean ordering
    // is asserted — the label mechanics, not the data story, are the test)
    assert(by(1).getAs[Long]("n_subs") < by(0).getAs[Long]("n_subs"))
    // feature volume comes from the 80% observation window only
    val totalEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("total_events")).sum < totalEvents)
  }
}
