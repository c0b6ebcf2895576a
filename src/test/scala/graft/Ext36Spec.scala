package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext36Queries
import graft.sources.Tables

/** Semantic invariants for n-gram coverage + weighted Jaccard. */
class Ext36Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("ngram coverage: one row per eval doc, coverage in [0,1], " +
    "covered <= n_shingles") {
    val rows = Ext36Queries.ngramCoverage(spark, sf).collect()
    assert(rows.nonEmpty)
    val evalDocs = Tables.documents(spark, sf)
      .filter(expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, " +
        "4), 16, 10) AS BIGINT) % 10 >= 8")).count()
    assert(rows.length.toLong == evalDocs,
      s"${rows.length} rows for $evalDocs eval docs")
    rows.foreach { r =>
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("n_shingles"))
      val c = r.getAs[Double]("coverage")
      assert(c >= 0 && c <= 1.0 + 1e-9, s"coverage=$c")
    }
  }

  test("weighted jaccard: scores every prefix candidate pair, values in " +
    "(0, 1], and a doc pair with identical text scores exactly 1") {
    val rows = Ext36Queries.weightedJaccard(spark, sf).collect()
    graft.operators.Dedup.unpersistIntermediates()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Double]("wjaccard")
      assert(w > 0 && w <= 1.0 + 1e-9, s"wjaccard=$w")
    }
    // exact-dup pairs (identical text) must score exactly 1.0
    val texts = Tables.documents(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    val exactDupPairs = rows.filter(r =>
      texts(r.getAs[Long]("id_1")) == texts(r.getAs[Long]("id_2")))
    exactDupPairs.foreach(r =>
      assert(r.getAs[Double]("wjaccard") == 1.0,
        "identical multiset must score 1.0"))
  }
}
