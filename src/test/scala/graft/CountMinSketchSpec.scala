package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMinSketchAgg

/** CMS invariants on the real corpus: never under-counts, overcount within
  * the eps bound, merge-across-partitions correctness.
  */
class CountMinSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch estimates: exact <= estimate <= exact + eps*N on real terms") {
    val agg = new CountMinSketchAgg(depth = 4, width = 2048)
    val terms = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("term"))
      .as[String]

    val sketch = terms.select(agg.toColumn.name("sketch")).head()
    val exact = terms.groupBy("term").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val eps = 2.0 * math.E / 2048 // depth-4 CMS bound

    exact.foreach { case (term, cnt) =>
      val est = agg.estimate(sketch, term)
      assert(est >= cnt, s"under-count for '$term': $est < $cnt")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"overcount beyond bound for '$term': $est vs $cnt (N=$n)")
    }
  }

  test("heavy hitters by sketch match heavy hitters by exact count") {
    val agg = new CountMinSketchAgg()
    val terms = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("term")).as[String]
    val sketch = terms.select(agg.toColumn.name("sketch")).head()
    val exact = terms.groupBy("term").count().as[(String, Long)].collect().toMap
    val threshold = exact.values.sum / 50 // 2% of the stream
    val exactHeavy = exact.filter(_._2 >= threshold).keySet
    val sketchHeavy = exact.keySet.filter(t => agg.estimate(sketch, t) >= threshold)
    // no false negatives ever; false positives bounded by the overcount
    assert(exactHeavy.subsetOf(sketchHeavy))
    assert(sketchHeavy.size <= exactHeavy.size + 3)
  }

  test("partition-merge correctness: sketch over repartitioned data is identical") {
    val agg = new CountMinSketchAgg()
    val terms = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("term")).as[String]
    val s1 = terms.coalesce(1).select(agg.toColumn.name("s")).head()
    val s8 = terms.repartition(8).select(agg.toColumn.name("s")).head()
    assert(s1.toSeq == s8.toSeq) // merge is exact, layout-independent
  }
}
