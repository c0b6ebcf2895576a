package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext8Queries

class Ext8Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("from_xml recovers every synthesized field") {
    val out = Ext8Queries.fromXml(spark, sf).collect()
    assert(out.nonEmpty)
    // every row's id parsed back equal to its doc_id
    out.foreach(r => assert(r.getLong(2) == r.getLong(1),
      s"lang ${r.getString(0)}: ${r.getLong(2)} of ${r.getLong(1)} ids parsed"))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == nDocs)
  }

  test("crosstab cells partition the event count") {
    val ct = Ext8Queries.crosstab(spark, sf)
    val buckets = ct.columns.filter(_ != "event_type_bucket")
    assert(buckets.sorted.sameElements(Array("0", "1", "2")))
    val cellSum = ct.select(buckets.map(b => sum(col(s"`$b`"))): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).sum
    assert(cellSum == graft.sources.Tables.events(spark, sf).count())
  }

  test("catalog table lifecycle: create + insert + read by name") {
    val out = Ext8Queries.catalogTable(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("click", "error"))
    val ev = graft.sources.Tables.events(spark, sf)
    assert(out("click") == ev.filter(col("event_type") === "click").count())
    assert(out("error") == ev.filter(col("event_type") === "error").count())
    // re-running must not double the inserted slice (overwrite resets)
    val again = Ext8Queries.catalogTable(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("orc round trip pushes the filter into the orc scan") {
    val df = graft.queries.Ext8Queries.orcRoundtrip(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Not(EqualTo(event_type,view))"),
      s"filter not pushed into the ORC scan:\n$plan")
    assert(df.collect().map(_.getString(0)).toSet ==
      Set("click", "error", "purchase", "signup"))
  }

  test("corrupt records are quarantined, never dropped") {
    val out = Ext8Queries.corruptRecords(spark, sf).collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val ev = graft.sources.Tables.events(spark, sf)
    assert(out(true) == ev.filter(col("event_id") % 10 === 0).count())
    assert(out(true) + out(false) == ev.count(),
      "every input line must land in exactly one population")
  }

  test("pagerank: ranks are a probability-mass distribution (mass conserved)") {
    val ranks = graft.queries.Ext8Queries.pagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 5)
    assert(ranks.values.forall(r => r > 0.0 && r < 1.0))
    // the transition graph is strongly connected at this corpus (every type
    // follows every type somewhere), so no rank mass leaks to dangling nodes
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6,
      s"rank mass not conserved: ${ranks.values.sum}")
  }

  test("user growth: cumulative count converges to total distinct users") {
    val g = Ext8Queries.userGrowth(spark, sf).orderBy("day").collect()
    val cums = g.map(_.getLong(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cum not monotone")
    val total = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(cums.last == total)
    assert(g.map(_.getLong(2)).sum == total, "new_users must sum to total users")
    // dau never exceeds cumulative-to-date
    assert(g.forall(r => r.getLong(1) <= r.getLong(3)))
  }
}
