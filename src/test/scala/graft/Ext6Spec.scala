package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.queries.Ext6Queries

class Ext6Spec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  test("partitioned scan prunes to the filtered partition directory") {
    val df = Ext6Queries.partitionedScan(spark, sf)
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters on the read-back scan: $scan")
    // only the click directory survives pruning
    val nParts = scan.selectedPartitions.partitionCount
    assert(nParts == 1, s"expected exactly the click partition, got $nParts")
  }

  test("latest snapshot plans a WindowGroupLimit (per-partition top-1 pass)") {
    val plan = Ext6Queries.latestSnapshot(spark, sf).queryExecution.executedPlan
    assert(plan.toString.contains("WindowGroupLimit"),
      s"rank<=1 filter should push a WindowGroupLimit below the sort:\n$plan")
  }

  test("latest snapshot keeps exactly one row per live key, the newest") {
    val snap = Ext6Queries.latestSnapshot(spark, sf)
    val keys = snap.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(keys == 0, "duplicate keys in snapshot")
    val ev = graft.sources.Tables.events(spark, sf)
    assert(snap.count() ==
      ev.select("user_id", "event_type").distinct().count())
    // spot-check one key: max ts wins
    val row = snap.orderBy("user_id", "event_type").limit(1).collect()(0)
    val maxTs = ev.filter(col("user_id") === row.getLong(0) &&
        col("event_type") === row.getString(1))
      .agg(max("ts_us")).collect()(0).getLong(0)
    assert(row.getLong(3) == maxTs)
  }
}
