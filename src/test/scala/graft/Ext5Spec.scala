package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

import graft.functions.ZOrderFunctions
import graft.queries.Ext5Queries

class Ext5Spec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  test("zorder2 interleaves bits (hand-computed Morton values)") {
    import spark.implicits._
    // x=3 (bits 0,1 -> even slots 0,2), y=5 (bits 0,2 -> odd slots 1,5):
    // 1 + 4 + 2 + 32 = 39. Identity rows pin the axes.
    val rows = Seq((3L, 5L), (0L, 0L), (1L, 0L), (0L, 1L), (255L, 0L), (0L, 255L))
      .toDF("x", "y")
      .select(ZOrderFunctions.zorder2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(39L, 0L, 1L, 2L, 0x5555L, 0xaaaaL))
  }

  test("zorder2 is monotone-preserving within a quadrant and codegen'd") {
    import spark.implicits._
    val df = (0L until 64L).map(i => (i % 8, i / 8)).toDF("x", "y")
      .select(ZOrderFunctions.zorder2(col("x"), col("y")).as("z"))
    // 8x8 grid -> z-values are a permutation of 0..63
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (0L until 64L))
    // a local Seq constant-folds to LocalTableScan; prove codegen on a real scan
    val scanned = graft.sources.Tables.events(spark, sf)
      .select(ZOrderFunctions.zorder2(col("user_id"), col("event_id")).as("z"))
    val wsc = scanned.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, "zorder2 must stay inside whole-stage codegen")
  }

  test("binned range join plans as a broadcast EQUI-join, not a nested loop") {
    val plan = Ext5Queries.binnedRangeJoin(spark, sf).queryExecution.executedPlan
    val bhj = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"expected BroadcastHashJoin on the bin key, got:\n$plan")
    val bnl = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.isEmpty, "bin expansion must eliminate the nested-loop theta join")
  }

  test("zorder query range-partitions by z-value (the clustering write shape)") {
    val plan = Ext5Queries.zorderCluster(spark, sf).queryExecution.executedPlan
    val hasRange = plan.toString.contains("rangepartitioning(zval")
    assert(hasRange, s"expected RangePartitioning on zval in:\n$plan")
  }

  test("transformWithState drain equals batch groupBy totals") {
    val got = Ext5Queries.twsTotals(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(expr("CAST(floor(value) AS BIGINT)")).as("sf"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("codegen char_entropy equals the exploded-histogram formulation") {
    import graft.functions.TextFunctions
    val docs = graft.sources.Tables.documents(spark, sf).limit(50)
    val viaExpr = docs.select(col("doc_id"),
        TextFunctions.char_distinct(col("text")).cast("long").as("nd"),
        TextFunctions.char_entropy(col("text")).as("ent"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val exploded = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nd"),
        (log2(sum("c")) - sum(expr("c * log2(c)")) / sum("c")).as("ent"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(viaExpr.keySet == exploded.keySet)
    viaExpr.foreach { case (id, (nd, ent)) =>
      assert(nd == exploded(id)._1, s"doc $id distinct chars")
      assert(math.abs(ent - exploded(id)._2) < 1e-9, s"doc $id entropy")
    }
    // edge cases: empty -> 0.0, single repeated char -> 0.0, two equal -> 1.0
    import spark.implicits._
    val edges = Seq("", "aaaa", "abab").toDF("t")
      .select(TextFunctions.char_entropy(col("t"))).collect().map(_.getDouble(0))
    assert(edges(0) == 0.0 && edges(1) == 0.0 && math.abs(edges(2) - 1.0) < 1e-12)
  }

  test("audio chunks cover every audio payload byte exactly once") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val audioBytes = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    val chunkBytes = Ext5Queries.audioChunks(spark, sf)
      .agg(sum("chunk_bytes")).collect()(0).getLong(0)
    assert(chunkBytes == audioBytes)
  }
}
