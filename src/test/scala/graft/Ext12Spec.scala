package graft

import org.apache.spark.sql.functions._

import graft.operators.{Anonymize, Graphs, RobustStats, Similarity}
import graft.queries.Ext12Queries

class Ext12Spec extends SparkTestBase {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // --- triangle counting ------------------------------------------------------

  test("triangleCount: K4 has 4 triangles regardless of edge orientation/dups") {
    val edges = Seq((1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (3, 3)).toDF("u", "v") // includes a reversed dup and a self-loop
    val out = Graphs.triangleCount(edges, "u", "v").collect()(0)
    assert(out.getAs[Long]("n_nodes") == 4)
    assert(out.getAs[Long]("n_edges") == 6)
    assert(out.getAs[Long]("n_triangles") == 4)
  }

  test("triangleCount: triangle-free bipartite graph counts zero") {
    val edges = Seq((1, 10), (1, 11), (2, 10), (2, 11)).toDF("u", "v")
    val out = Graphs.triangleCount(edges, "u", "v").collect()(0)
    assert(out.getAs[Long]("n_triangles") == 0)
    assert(out.getAs[Long]("n_edges") == 4)
  }

  test("q_triangle_count finds a non-trivial nation trade graph") {
    val out = Ext12Queries.triangleCount(spark, sf).collect()(0)
    assert(out.getAs[Long]("n_nodes") > 3)
    assert(out.getAs[Long]("n_triangles") > 0)
  }

  // --- k-anonymity ------------------------------------------------------------

  test("kAnonymize suppresses exactly the groups smaller than k") {
    val df = Seq(
      ("a", "x", 1), ("a", "x", 2), ("a", "x", 3), // group of 3: kept at k=3
      ("b", "y", 4), ("b", "y", 5), // group of 2: suppressed at k=3
      ("c", "z", 6) // singleton: suppressed
    ).toDF("qa", "qb", "id")
    val out = Anonymize.kAnonymize(df, Seq("qa", "qb"), 3)
      .orderBy("id").collect()
    assert(out.take(3).forall(r => r.getString(0) == "a" && r.getString(1) == "x"))
    assert(out.drop(3).forall(r => r.getString(0) == "*" && r.getString(1) == "*"))
    // every released row is identical to >= k-1 others on the quasi columns
    val released = Anonymize.kAnonymize(df, Seq("qa", "qb"), 3)
      .groupBy("qa", "qb").count().as[(String, String, Long)].collect()
    assert(released.forall(_._3 >= 3))
  }

  // --- robust stats -----------------------------------------------------------

  test("winsorizedMean clips the outlier but keeps interior values") {
    val df = (Seq.fill(9)(10.0) :+ 1000.0).zipWithIndex
      .map { case (v, i) => ("g", v, i) }.toDF("grp", "v", "i")
    val out = RobustStats.winsorizedMean(df, "grp", "v", 0.05, 0.95)
      .collect()(0)
    val raw = out.getAs[Double]("avg_raw")
    val wins = out.getAs[Double]("avg_winsorized")
    assert(raw == 109.0)
    assert(wins < raw) // the 1000 got clipped toward p95
    assert(wins > 10.0)
  }

  test("madOutliers flags only the far point") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0)).zipWithIndex
      .map { case (v, i) => ("g", v, i) }.toDF("grp", "v", "i")
    val out = RobustStats.madOutliers(df, "grp", "v", 3.0).collect()(0)
    assert(out.getAs[Long]("n_outliers") == 1L)
    assert(out.getAs[Double]("med") == 3.5)
  }

  // --- semantic dedup ---------------------------------------------------------

  test("semDedup keeps the lowest id of a near-identical pair") {
    val emb = Tables12Fixtures.embeddings(spark)
    val centroids = emb.filter(col("vec_id") < 2)
    val kept = Similarity.semDedup(emb, centroids, "vec_id", "embedding", 0.95)
      .as[(Long, Long)].collect().toMap
    // vectors 0 and 2 are identical -> 2 dropped; 3 is orthogonal -> kept
    assert(kept.contains(0L) && !kept.contains(2L))
    assert(kept.contains(3L))
  }

  test("q_semdedup keeps fewer than all vectors but most of them") {
    val out = Ext12Queries.semDedup(spark, sf)
    val n = out.count()
    assert(n > 400 && n <= 500)
  }

  // --- curriculum / shards / weights ------------------------------------------

  test("q_curriculum phases are 1..4 and roughly balanced") {
    val phases = Ext12Queries.curriculum(spark, sf)
      .groupBy("phase").count().as[(Int, Long)].collect().toMap
    assert(phases.keySet.subsetOf(Set(1, 2, 3, 4)))
    assert(phases.values.sum == 500)
    assert(phases.values.forall(_ > 50)) // quartiles: no empty phase
  }

  test("q_interleave_shards spreads every source across all 8 shards") {
    val out = Ext12Queries.interleaveShards(spark, sf)
      .groupBy("source").agg(countDistinct("shard").as("nsh"))
      .as[(String, Long)].collect()
    assert(out.forall(_._2 == 8L)) // 25 docs per source at sf0.001
  }

  test("q_class_weights: inverse-frequency weights average to ~1") {
    val w = Ext12Queries.classWeights(spark, sf)
      .agg(avg(col("w_inv") * col("n")).as("m")).as[Double].collect()(0)
    assert(math.abs(w - 50.0) < 1e-3) // n_total/n_classes = 500/10 (w_inv rounded 6dp)
  }

  // --- TPC-H Q6 / Q14 ---------------------------------------------------------

  test("q_tpch_q6 matches the hand-checked sf0.001 revenue") {
    val rev = Ext12Queries.tpchQ6(spark, sf).as[Double].collect()(0)
    // 365888.56 verified against DuckDB (ROUND of the double sum); the
    // exact-DECIMAL per-row-rounded sum agrees to well under a cent/row
    assert(math.abs(rev - 365888.56) < 0.01)
  }

  test("q_tpch_q14 promo share is a sane percentage") {
    val pct = Ext12Queries.tpchQ14(spark, sf).as[Double].collect()(0)
    assert(pct > 0.0 && pct < 100.0)
  }

  // --- vocab / matryoshka / compaction ------------------------------------------

  test("q_vocab_growth: vocabulary never exceeds token count, ratio in (0,1]") {
    val rows = Ext12Queries.vocabGrowth(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vocab") <= r.getAs[Long]("n_tokens"))
      val h = r.getAs[Double]("heaps_ratio")
      assert(h > 0.0 && h <= 1.0)
    }
  }

  test("q_matryoshka: every query reports, recall in [0,1]") {
    val rows = Ext12Queries.matryoshkaRecall(spark, sf).collect()
    assert(rows.length == 20) // zero-recall queries included via left join
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_overlap") <= 3)
    }
  }

  test("q_compaction_plan: bins conserve files and bytes, fill near target") {
    val plan = Ext12Queries.compactionPlan(spark, sf)
    val total = plan.agg(sum("n_files"), sum("bytes")).collect()(0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(total.getLong(0) == docs.count())
    assert(total.getLong(1) == docs.agg(sum("n_chars")).collect()(0).getLong(0))
    // every bin except possibly each source's last fills to at least the
    // target minus one max file size (the undershoot bound of the scheme)
    val maxFile = docs.agg(max("n_chars")).collect()(0).getLong(0)
    val under = plan.filter(col("bytes") < 5000L - maxFile)
      .groupBy("source").count().as[(String, Long)].collect()
    assert(under.forall(_._2 <= 1))
    assert(plan.select("source", "bin").distinct().count() == plan.count())
  }

  // --- decay ------------------------------------------------------------------

  test("q_freshness_decay: decayed sum is strictly below the raw sum") {
    val rows = Ext12Queries.freshnessDecay(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_decayed") < r.getAs[Double]("sum_raw"))
      assert(r.getAs[Double]("sum_decayed") > 0.0)
    }
  }
}

/** Tiny deterministic embedding fixtures for the semDedup unit test. */
object Tables12Fixtures {
  def embeddings(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)), // identical to 0
      (3L, Array(0.0f, 0.0f, 1.0f)) // orthogonal to both centroids
    ).toDF("vec_id", "embedding")
  }
}
