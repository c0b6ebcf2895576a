package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the analyzed streaming logical plans pinned in PLANS.md
  * (`sbt "Test/runMain graft.PlanDump"`). Kept in test scope so the plan
  * text in PLANS.md can be regenerated when the stream shapes change.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d1 = graft.util.TempDirs.create("pin-tws").toString
    println("=== TWS_SESSIONS ANALYZED ===")
    println(graft.streaming.SessionTimers
      .sessionStream(spark, d1, 1800000000L).queryExecution.analyzed.treeString)
    val d2 = graft.util.TempDirs.create("pin-soj").toString
    println("=== STREAM_OUTER_JOIN ANALYZED ===")
    println(graft.queries.Ext37Queries
      .outerJoinStream(spark, d2).queryExecution.analyzed.treeString)
    spark.stop()
  }
}
