package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The native codegen CosineSimilarity must be bit-identical to the HOF
  * reference formulation — on real embeddings, in both codegen and
  * interpreted (eval) paths.
  */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("native cosine == HOF cosine, bit-for-bit, on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.filter($"vec_id" < 50).select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.filter($"vec_id" >= 50 && $"vec_id" < 100)
      .select($"vec_id".as("idb"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      Similarity.cosine($"va", $"vb").as("native"),
      Similarity.cosineHof($"va", $"vb").as("hof"))
      .filter($"native" =!= $"hof") // exact double comparison
      .count()
    assert(diff == 0, s"$diff pairs differ bit-wise between native and HOF cosine")
  }

  test("native sq_l2 / l1 == HOF folds, bit-for-bit, on real embeddings") {
    import graft.functions.VectorFunctions.{l1_distance, sq_l2_distance}
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.filter($"vec_id" < 50).select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.filter($"vec_id" >= 50 && $"vec_id" < 100)
      .select($"vec_id".as("idb"), $"embedding".as("vb"))
    val hofSq = aggregate(
      zip_with($"va", $"vb",
        (x, y) => (x.cast("double") - y.cast("double"))
          * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val hofL1 = aggregate(
      zip_with($"va", $"vb",
        (x, y) => abs(x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val diff = a.crossJoin(b).select(
      sq_l2_distance($"va", $"vb").as("nsq"), hofSq.as("hsq"),
      l1_distance($"va", $"vb").as("nl1"), hofL1.as("hl1"))
      .filter($"nsq" =!= $"hsq" || $"nl1" =!= $"hl1")
      .count()
    assert(diff == 0, s"$diff pairs differ bit-wise between native and HOF distances")
  }

  test("interpreted eval path (codegen disabled) matches too") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val v = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
      val native = v.select(Similarity.cosine($"a", $"b")).as[Double].head()
      val hof = v.select(Similarity.cosineHof($"a", $"b")).as[Double].head()
      assert(native == hof)
      assert(math.abs(native - 10.0 / 14.0) < 1e-12)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null inputs yield null") {
    val v = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val out = v.select(Similarity.cosine($"a", $"b")).collect()
    assert(out(0).isNullAt(0))
  }

  test("native poly_hash == HOF fingerprint on the ASCII corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        graft.operators.TextAnalysis.fingerprint(col("text")).as("native"),
        graft.operators.TextAnalysis.fingerprintHof(col("text")).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff == 0)
    // hand value: "ab" -> 97*31+98 = 3105
    val v = Seq("ab").toDF("t")
      .select(graft.operators.TextAnalysis.fingerprint($"t")).as[Long].head()
    assert(v == 3105L)
  }
}
