package graft

import org.apache.spark.sql.functions._

/** Edge-case pins from the round-2 review: analysis-time tokenizer pattern
  * validation, LSH empty-input behavior, resize-plan dimension clamping.
  */
class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_tokenize rejects NULL and malformed patterns at analysis time") {
    graft.functions.GraftExtensions.register(spark)
    Seq((1L, "a b")).toDF("id", "text").createOrReplaceTempView("tok_edge")
    val nullErr = intercept[Exception] {
      spark.sql("SELECT graft_tokenize(text, CAST(NULL AS STRING)) FROM tok_edge")
        .collect()
    }
    assert(nullErr.getMessage.toLowerCase.contains("null"))
    val badErr = intercept[Exception] {
      spark.sql("SELECT graft_tokenize(text, '(') FROM tok_edge").collect()
    }
    assert(badErr.getMessage.toLowerCase.contains("pattern"))
  }

  test("lshNearDup on empty or all-null input returns empty, not an exception") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity
      .lshNearDup(empty, "vec_id", "embedding", 0.5).count() == 0)
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    assert(graft.operators.Similarity
      .lshNearDup(allNull, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("resizePlan never plans a 0-pixel edge on extreme aspect ratios") {
    val decoded = Seq(
      (1L, "image", 1, 600),    // would naively fit to 0 x 256
      (2L, "image", 600, 1),
      (3L, "image", 100, 100),  // already fits
      (4L, "image", 512, 512)   // square downscale
    ).toDF("media_id", "kind", "width", "height")
    val out = graft.operators.Multimodal.resizePlan(decoded, maxEdge = 256)
      .select("media_id", "out_w", "out_h")
      .as[(Long, Int, Int)].collect()
      .map { case (k, w, h) => k -> (w, h) }.toMap
    assert(out(1L) == (1, 256))
    assert(out(2L) == (256, 1))
    assert(out(3L) == (100, 100))
    assert(out(4L) == (256, 256))
  }
}
