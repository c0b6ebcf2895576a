package graft

import org.apache.spark.sql.functions._

import graft.operators.Graphs
import graft.queries.Ext20Queries

class Ext20Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("adamic-adar: no predicted pair is an existing edge, scores positive") {
    val rows = Ext20Queries.adamicAdar(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("u") < r.getAs[Int]("v"))
      assert(r.getAs[Long]("common") >= 1L)
      assert(r.getAs[Double]("aa_score") > 0.0)
    }
  }

  test("adamic-adar operator: hand-checkable path graph") {
    import spark.implicits._
    // path 1-2-3: only candidate pair (1,3) via center 2 (deg 2)
    val e = Seq((1, 2), (2, 3)).toDF("u", "v")
    val out = Graphs.adamicAdar(e, "u", "v").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Int]("u") == 1 && r.getAs[Int]("v") == 3)
    assert(math.abs(r.getAs[Double]("aa_score") - 1.0 / math.log(2.0)) < 1e-6)
  }

  test("adamic-adar operator: center-degree cap drops hub wedges") {
    import spark.implicits._
    // star center 0 with leaves 1..4 (deg 4) + path 5-6-7 (center deg 2)
    val e = (Seq((0, 1), (0, 2), (0, 3), (0, 4)) ++ Seq((5, 6), (6, 7))).toDF("u", "v")
    val capped = Graphs.adamicAdar(e, "u", "v", maxCenterDegree = 3).collect()
    // all star wedges (center deg 4) dropped; only (5,7) survives
    assert(capped.map(r => (r.getAs[Int]("u"), r.getAs[Int]("v"))).toSet
      == Set((5, 7)))
  }

  test("round-13: bot detection survives a single-event user (element_at " +
      "index 0 threw; median is NULL, flag decided by peak rate alone)") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft-bot-edge").toString
    Seq(
      (1L, 100L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click"),
      (2L, 100L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), "click"),
      (3L, 200L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "click")
    ).toDF("event_id", "user_id", "ts", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val out = Ext20Queries.botDetection(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val lonely = out(200L)
    assert(lonely.getAs[Long]("n_gaps") == 0L)
    assert(lonely.isNullAt(lonely.fieldIndex("med_gap_us")),
      "gap-less user must have NULL median")
    assert(lonely.getAs[Int]("bot_flag") == 0)
    assert(out(100L).getAs[Long]("n_gaps") == 1L)
  }

  test("khop: seeds at hop 0, hops within 0..3, frontier monotone") {
    val rows = Ext20Queries.khopReach(spark, sf).collect()
    assert(rows.nonEmpty)
    val hops = rows.map(_.getAs[Int]("hop"))
    assert(hops.forall(h => h >= 0 && h <= 3))
    assert(hops.contains(0), "seed region must appear at hop 0")
    // node ids unique (min-hop collapses duplicates)
    val nodes = rows.map(_.getAs[Int]("node"))
    assert(nodes.distinct.length == nodes.length)
  }

  test("degree dist: histogram masses sum to the customer count") {
    val rows = Ext20Queries.degreeDist(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalCusts = rows.map(_.getAs[Long]("n_customers")).sum
    val nBuyers = graft.sources.Tables.orders(spark, sf)
      .select(countDistinct("o_custkey")).collect()(0).getLong(0)
    assert(totalCusts == nBuyers)
    val slopes = rows.map(_.getAs[Double]("loglog_slope")).distinct
    assert(slopes.length == 1, "slope must be a single global value")
  }

  test("perplexity filter: ~90% kept, ranks in [0,1], ppl positive") {
    val rows = Ext20Queries.perplexityFilter(spark, sf).collect()
    assert(rows.nonEmpty)
    val kept = rows.count(_.getAs[Int]("keep") == 1)
    val frac = kept.toDouble / rows.length
    assert(frac >= 0.85 && frac <= 0.95, s"keep fraction $frac")
    rows.foreach { r =>
      assert(r.getAs[Double]("ppl") > 0.0)
      val pr = r.getAs[Double]("ppl_rank")
      assert(pr >= 0.0 && pr <= 1.0)
    }
  }

  test("target encode: smoothing pulls category means toward the global mean") {
    val rows = Ext20Queries.targetEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    // global mean from the blend identity at any row: te between cat and global
    rows.foreach { r =>
      val (cm, te) = (r.getAs[Double]("cat_mean"), r.getAs[Double]("te_smoothed"))
      assert(r.getAs[Long]("n") > 0)
      // smoothed value lies between the category mean and the global mean,
      // so it can't overshoot the category mean's direction
      assert(te > 0.0 && !te.isNaN)
      assert(math.abs(te - cm) < math.abs(cm) + 1e6) // sanity envelope
    }
  }

  test("mutual information: nonnegative total, cell masses cover the table") {
    val rows = Ext20Queries.miFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = rows.map(_.getAs[Double]("mi_total")).distinct
    assert(totals.length == 1)
    assert(totals.head >= 0.0, "MI is nonnegative")
    val mass = rows.map(_.getAs[Long]("n_xy")).sum
    val nLi = graft.sources.Tables.lineitem(spark, sf).count()
    assert(mass == nLi)
  }

  test("bot detection: gaps count = events - 1 per user, flags are 0/1") {
    val rows = Ext20Queries.botDetection(spark, sf).collect()
    assert(rows.nonEmpty)
    val evPerUser = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("n_gaps") == evPerUser(uid) - 1)
      assert(Set(0, 1)(r.getAs[Int]("bot_flag")))
      assert(r.getAs[Double]("med_gap_us") >= 0.0)
      assert(r.getAs[Long]("max_per_hour") >= 1L)
    }
  }

  test("power iteration: unit-norm loadings, diag-dominant direction stable") {
    val rows = Ext20Queries.powerIteration(spark, sf).collect()
    assert(rows.length == 64)
    val norm = math.sqrt(rows.map(r => {
      val l = r.getAs[Double]("loading"); l * l
    }).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"norm $norm")
    // index set complete 0..63
    assert(rows.map(_.getAs[Int]("i")).sorted.toSeq == (0 until 64))
  }
}
