package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext9Queries

class Ext9Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("tpch q3 plan: broadcast dim, sort-free top-10") {
    val df = Ext9Queries.tpchQ3(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"customer not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 planned as a full sort:\n$plan")
    assert(df.count() == 10)
  }

  test("tpch q5 plan: single shuffle join, every dim broadcast") {
    val df = Ext9Queries.tpchQ5(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // orders ⋈ lineitem is the one non-broadcast join
    val sortMergeOrHash = "SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(plan).size
    assert(sortMergeOrHash <= 1, s"more than one shuffle join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"dims not broadcast:\n$plan")
    // one row per nation that actually has a supplier (10 suppliers at
    // sf0.001 — the nation count follows the supplier table, not nation's 25)
    val supplierNations = graft.sources.Tables.supplier(spark, sf)
      .select("s_nationkey").distinct().count()
    assert(df.count() <= supplierNations && df.count() > 0)
  }

  test("tpch q18 plan: broadcast customer, sort-free top-100, nonempty") {
    val df = Ext9Queries.tpchQ18(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"customer not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 planned as a full sort:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every surviving order genuinely exceeds the HAVING threshold
    rows.foreach(r => assert(r.getDouble(5) > 250))
  }

  test("tpch q21 plan: semi+anti exists topology, broadcast dims, nonempty") {
    val df = Ext9Queries.tpchQ21(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"other-supplier EXISTS not a semi join:\n$plan")
    assert(plan.contains("LeftAnti"), s"other-late NOT EXISTS not an anti join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"supplier/nation not broadcast:\n$plan")
    val total = df.agg(sum("numwait")).head().getLong(0)
    assert(total > 0)
  }

  test("funnel stages are monotonically non-increasing") {
    val rows = Ext9Queries.funnel(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("view") >= rows("view_click"))
    assert(rows("view_click") >= rows("view_click_purchase"))
  }

  test("event sequence is ts-ordered and hit implies subsequence") {
    val rows = Ext9Queries.eventSequence(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seq = r.getString(1)
      val hit = r.getBoolean(2)
      assert(hit == "v.*c.*p".r.findFirstIn(seq).isDefined)
    }
    // total sequence length == total event count
    val totalLen = rows.map(_.getString(1).length.toLong).sum
    assert(totalLen == graft.sources.Tables.events(spark, sf).count())
  }

  test("cohort retention: offset-0 cell equals cohort size") {
    val out = Ext9Queries.cohortRetention(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every cohort has an offset-0 cell, and no cell exceeds it
    val cohorts = out.keys.map(_._1).toSet
    cohorts.foreach { c =>
      val base = out((c, 0L))
      out.filter(_._1._1 == c).values.foreach(n => assert(n <= base))
    }
  }

  test("rolling 7-day distinct >= same-day distinct, every day") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), to_date(timestamp_micros(col("ts_us"))).as("day"),
        col("user_id"))
    val daily = ev.groupBy("event_type", "day")
      .agg(countDistinct("user_id").as("n1"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n1"))
    val rolled = Ext9Queries.rollingDistinct(spark, sf)
    val joined = rolled.join(daily, Seq("event_type", "day")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(2) >= r.getLong(3),
      s"rolling < daily at ${r.getString(0)}/${r.getString(1)}"))
  }

  test("rolling distinct plan: spine join keyed on the week bucket") {
    val plan = Ext9Queries.rollingDistinct(spark, sf)
      .queryExecution.executedPlan.toString
    // the spine⋈triples join must carry (event_type, bucket) — joining on
    // event_type alone would re-scan every day per triple (the unbinned
    // scale-killer this formulation replaces)
    val joinLines = plan.linesIterator.filter(l =>
      l.contains("Join") && l.contains("event_type")).toSeq
    assert(joinLines.exists(_.contains("bucket")),
      s"spine join not bucket-keyed:\n$plan")
  }

  test("ann rerank plan: no all-pairs query x corpus join") {
    val plan = Ext9Queries.annRerank(spark, sf)
      .queryExecution.executedPlan.toString
    // the only nested-loop joins allowed are the condition-less broadcasts
    // against the tiny centroid table; a NOT(query=neighbor) NLJ condition
    // is the signature of the old all-pairs coarse pass
    plan.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).foreach {
      l => assert(!l.contains("NOT"), s"all-pairs coarse join present:\n$plan")
    }
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("gap fill: no nulls, observed days pass through unchanged") {
    val out = Ext9Queries.gapFill(spark, sf)
    assert(out.filter(col("filled").isNull).count() == 0)
    // non-gap rows carry the observed daily value exactly
    val observed = out.filter(!col("was_gap"))
    assert(observed.count() > 0)
    // interpolated values stay within the user's observed min/max envelope
    val env = out.groupBy("user_id")
      .agg(min(when(!col("was_gap"), col("filled"))).as("lo"),
        max(when(!col("was_gap"), col("filled"))).as("hi"))
    val bad = out.join(env, "user_id")
      .filter(col("filled") < col("lo") - 1e-6 || col("filled") > col("hi") + 1e-6)
    assert(bad.count() == 0, "interpolation escaped the observed envelope")
  }

  test("null-safe join keeps exactly one NULL-key row") {
    val out = Ext9Queries.nullSafeJoin(spark, sf).collect()
    assert(out.count(_.isNullAt(0)) == 1)
    // pair arithmetic: n_pairs == n_left * n_right on every row
    out.foreach(r => assert(r.getLong(3) == r.getLong(1) * r.getLong(2)))
    // an inner equi-join would drop the NULL bucket
    val plain = out.length - 1
    assert(plain == 6, s"expected 6 non-null buckets, got $plain")
  }

  test("repetition filter flags the degenerate doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a a a a a a", "en", "s", 19L),
      (2L, "the quick brown fox jumps over lazy dogs tonight quietly", "en", "s", 56L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("documents_tmp")
    val staged = graft.util.TempDirs.create("graft-rep")
    docs.write.mode("overwrite").parquet(staged.toString + "/documents.parquet")
    val out = Ext9Queries.repetitionFilter(spark, staged.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(6), "all-same-word doc must fail")
    assert(out(2L).getBoolean(6), "all-distinct doc must pass")
    assert(out(1L).getLong(1) == 10 && out(1L).getLong(2) == 1)
  }

  test("tpch q17: correlated subquery decorrelates (no subquery in the " +
      "physical plan) and matches the hand-built aggregate join") {
    val df = Ext9Queries.tpchQ17(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), s"subquery survived decorrelation:\n$plan")
    // independent hand-decorrelated formulation
    val l = graft.sources.Tables.lineitem(spark, sf)
    val p = graft.sources.Tables.part(spark, sf).filter(col("p_size") < 11)
    val pa = l.groupBy(col("l_partkey").as("pk"))
      .agg((avg(col("l_quantity")) * 0.2).as("qa"))
    val expected = l
      .join(p, col("p_partkey") === col("l_partkey"))
      .join(pa, col("pk") === col("l_partkey"))
      .filter(col("l_quantity") < col("qa"))
      .groupBy(col("p_brand"))
      .agg((sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double") / 7.0).as("avg_yearly"))
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = expected.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == exp.keySet && got.nonEmpty)
    got.foreach { case (b, v) => assert(math.abs(v - exp(b)) < 1e-9, b) }
  }

  test("ann rerank is a subset of brute-force top-30 and scores match exact cosine") {
    val exact = graft.operators.Similarity.bruteForceTopK(
        graft.sources.Tables.embeddings(spark, sf).filter(col("vec_id") < 20),
        graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding", 30)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rer = Ext9Queries.annRerank(spark, sf).collect()
    assert(rer.length == 20 * 5)
    rer.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      exact.get(k).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9,
        s"score mismatch at $k"))
    }
  }
}
