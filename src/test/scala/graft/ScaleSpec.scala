package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Scale

/** The scale helpers must change the PLAN, not just the result: bucketed
  * joins lose their exchanges, salted joins/aggs keep exact results.
  */
class ScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join runs with zero shuffle exchanges") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      val l = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Scale.writeBucketed(o, "t_orders_b", 4, Seq("o_orderkey"))
      Scale.writeBucketed(l, "t_lineitem_b", 4, Seq("o_orderkey"))
      val joined = Scale.bucketedJoin(spark, "t_orders_b", "t_lineitem_b", Seq("o_orderkey"))
      val shuffles = joined.queryExecution.executedPlan
        .collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"bucketed join still shuffles: ${shuffles.size}")
      // and it is still correct
      val expect = o.join(l, Seq("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS t_orders_b")
      spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    // one hot key (~80% of rows) against a uniform build side; thresholds
    // lowered so the test corpus's hot partition counts as skewed
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val dir = graft.util.TempDirs.create("graft-skew")
    try {
      val skewed = spark.range(0, 200000)
        .select(when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          (col("id") * 3).as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), lit("x").as("tag"))
      // real parquet scans: skew detection needs actual shuffle block sizes
      skewed.write.mode("overwrite").parquet(s"$dir/fact")
      dim.write.mode("overwrite").parquet(s"$dir/dim")
      val joined = spark.read.parquet(s"$dir/fact")
        .join(spark.read.parquet(s"$dir/dim"), Seq("k"))
      // collect() executes THIS DataFrame's QueryExecution — count() would
      // finalize a different AdaptiveSparkPlanExec instance and leave the
      // inspected one un-executed (still showing the initial plan)
      val n = joined.collect().length
      // 160000 hot-key rows match dim's k=7; the 40000 k=id rows (multiples
      // of 5) match dim only below 1000 -> 200 rows
      assert(n == 160000 + 200, s"unexpected join cardinality $n")
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join: identical result to the plain join on a skewed key") {
    // 10k rows all sharing ONE key — the pathological case
    val big = (1 to 10000).map(i => ("hot", i.toLong)).toDF("k", "rowid")
    val small = Seq(("hot", "dim-payload"), ("cold", "unused")).toDF("k", "v")
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum($"rowid")).head()
    val salted = Scale.saltedJoin(big, small, Seq("k"), "rowid", salts = 8)
      .agg(count(lit(1)), sum($"rowid")).head()
    assert(plain == salted)
  }

  test("salted sum/count equals direct aggregation") {
    val df = (1 to 5000).map(i => (if (i % 100 == 0) "rare" else "hot", i.toDouble, i.toLong))
      .toDF("k", "v", "rowid")
    val direct = df.groupBy("k").agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(_.toString).toSeq
    val salted = Scale.saltedSumCount(df, Seq("k"), "v", "rowid", salts = 8)
      .orderBy("k").collect().map(_.toString).toSeq
    assert(direct == salted)
  }

  test("partitioned write produces partition directories and round-trips") {
    val dir = graft.util.TempDirs.create("graft-part").toString + "/out"
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("etype", col("event_type"))
    Scale.writePartitioned(ev, dir, Seq("etype"), targetPartitions = 4)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("etype=")) == 5)
    // partition pruning: reading one partition scans only that directory
    val one = spark.read.parquet(dir).filter(col("etype") === "click")
    assert(one.count() == ev.filter(col("event_type") === "click").count())
  }
}
