package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, ScaleFence, Similarity}

/** The all-pairs fences must be ENFORCED, not advised: oversized inputs
  * throw with a pointer to the scale-safe sibling; under-cap inputs run
  * unchanged; malformed conf and streaming inputs fail with clear messages.
  */
class FenceSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val docs = (1 to 60)
    .map(i => (i.toLong, s"alpha beta gamma delta token$i words here"))
    .toDF("doc_id", "body")

  test("self-pairs guard trips past the row cap, names the sibling") {
    withConf(ScaleFence.MaxInputRowsKey -> "50") {
      val e = intercept[IllegalArgumentException] {
        Dedup.jaccardPairs(docs, "doc_id", "body")
      }
      assert(e.getMessage.contains("jaccardPrefixPairs"))
      assert(e.getMessage.contains(ScaleFence.MaxInputRowsKey))
    }
  }

  test("self-pairs guard passes under the cap; -1 disables it") {
    withConf(ScaleFence.MaxInputRowsKey -> "60") {
      assert(Dedup.jaccardPairs(docs, "doc_id", "body").columns.nonEmpty)
    }
    withConf(ScaleFence.MaxInputRowsKey -> "-1") {
      assert(Dedup.jaccardPairs(docs, "doc_id", "body").columns.nonEmpty)
    }
  }

  test("two-sided guard judges the |Q|x|C| product, not either side") {
    val vecs = (1 to 50).map(i => (i.toLong, Array(i.toFloat, 1f, 0f)))
      .toDF("id", "vec")
    // 50 x 50 = 2500 pairs: trips a 1000-pair budget even though each side
    // is tiny, while 10 x 50 = 500 passes the same budget.
    withConf(ScaleFence.MaxPairsKey -> "1000") {
      val e = intercept[IllegalArgumentException] {
        Similarity.bruteForceTopK(vecs, vecs, "id", "vec", 3)
      }
      assert(e.getMessage.contains(ScaleFence.MaxPairsKey))
      val small = vecs.limit(10)
      assert(Similarity.bruteForceTopK(small, vecs, "id", "vec", 3)
        .columns.nonEmpty)
    }
  }

  test("malformed fence conf names the key and the offending value") {
    withConf(ScaleFence.MaxInputRowsKey -> "10k") {
      val e = intercept[IllegalArgumentException] {
        Dedup.jaccardPairs(docs, "doc_id", "body")
      }
      assert(e.getMessage.contains(ScaleFence.MaxInputRowsKey))
      assert(e.getMessage.contains("10k"))
    }
  }

  test("streaming input is rejected up front as batch-only") {
    val stream = spark.readStream.format("rate").load()
      .select(col("value").as("doc_id"), lit("text").as("body"))
    val e = intercept[UnsupportedOperationException] {
      Dedup.jaccardPairs(stream, "doc_id", "body")
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("Long.MaxValue fence conf means effectively unlimited, not overflow") {
    // maxPairs+1 used to overflow to Long.MinValue and hand limit() a
    // negative probe; the saturating increment must let the call pass.
    withConf(ScaleFence.MaxPairsKey -> Long.MaxValue.toString) {
      val vecs = (1 to 10).map(i => (i.toLong, Array(i.toFloat, 1f, 0f)))
        .toDF("id", "vec")
      assert(Similarity.bruteForceTopK(vecs, vecs, "id", "vec", 3)
        .columns.nonEmpty)
    }
    withConf(ScaleFence.MaxInputRowsKey -> Long.MaxValue.toString) {
      assert(Dedup.jaccardPairs(docs, "doc_id", "body").columns.nonEmpty)
    }
  }

  test("fence probes plans whose stats rowCount would be an estimate") {
    // A non-collapsible plan (filter over an exchange-bearing aggregate)
    // must be judged by the limit-probe, not by whatever rowCount CBO
    // propagates: 60 docs through a no-op aggregate still trips a 50-row
    // fence.
    val laundered = docs.groupBy("doc_id")
      .agg(first(col("body")).as("body"))
      .filter(col("doc_id") > 0)
    withConf(ScaleFence.MaxInputRowsKey -> "50") {
      val e = intercept[IllegalArgumentException] {
        Dedup.jaccardPairs(laundered, "doc_id", "body")
      }
      assert(e.getMessage.contains("jaccardPrefixPairs"))
    }
  }
}
