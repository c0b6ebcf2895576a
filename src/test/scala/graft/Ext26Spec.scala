package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext26Queries
import graft.sources.Tables

/** Semantic invariants for the retrieval-scoring / dataset-split batch. */
class Ext26Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bm25: scores positive, monotone in matched-term count on average") {
    val rows = Ext26Queries.bm25(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("bm25") > 0.0)
      val t = r.getAs[Long]("n_terms")
      assert(t >= 1 && t <= 3)
    }
    // docs matching all 3 query terms outscore single-term docs on average
    val by = rows.groupBy(_.getAs[Long]("n_terms"))
      .map { case (k, rs) =>
        k -> rs.map(_.getAs[Double]("bm25")).sum / rs.length }
    if (by.contains(1L) && by.contains(3L)) assert(by(3L) > by(1L))
  }

  test("ecdf: decile populations rebuild the per-type total and stay " +
    "near-uniform; ranges are ordered") {
    val rows = Ext26Queries.ecdf(spark, sf).collect()
    val types = Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    assert(byType.keySet == types.keySet)
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum == types(t))
      // rank transform => every decile within 2x of the ideal n/10
      val ideal = types(t) / 10.0
      rs.foreach { r =>
        assert(r.getAs[Long]("n") < ideal * 2 + 2)
        assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
      }
      // value ranges of successive deciles do not overlap
      val sorted = rs.sortBy(_.getAs[Int]("decile"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
        case _ =>
      }
    }
  }

  test("cv folds: partition of the corpus — counts rebuild the total, " +
    "all 5 folds populated, assignment pure in doc_id") {
    val rows = Ext26Queries.cvFolds(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val folds = rows.map(_.getAs[Int]("fold")).toSet
    assert(folds == Set(0, 1, 2, 3, 4))
    // determinism: a second run produces the identical assignment audit
    val again = Ext26Queries.cvFolds(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("group split: no user leaks across splits, event counts rebuild " +
    "the corpus, train is the large split") {
    val rows = Ext26Queries.groupSplit(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    // the no-leakage proof: per-split distinct users sum to the corpus
    // distinct users (a leaked user would be counted twice)
    val users = ev.select(countDistinct("user_id")).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    val byName = rows.map(r => r.getAs[String]("split") -> r).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train").getAs[Long]("n_events") >
      byName("val").getAs[Long]("n_events"))
    assert(byName("train").getAs[Long]("n_events") >
      byName("test").getAs[Long]("n_events"))
  }
}
