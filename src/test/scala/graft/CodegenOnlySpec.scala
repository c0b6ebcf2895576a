package graft

import org.apache.spark.sql.functions._

import graft.functions.{JaroWinklerFunctions, LevenshteinFunctions, TextFunctions, VectorFunctions, ZOrderFunctions}

/** Every custom Catalyst expression must actually COMPILE under codegen.
  *
  * A doGenCode that emits unparseable Java does not fail a query: Spark
  * logs a warning and silently demotes the projection (or the whole
  * stage) to interpreted eval — results stay right, throughput quietly
  * halves. Round 14 hit exactly this: a generated line starting with
  * "||" was eaten by the code-Block interpolator's stripMargin
  * re-application, and the vector hot path ran interpreted for several
  * measurements before the per-query timings gave it away.
  *
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` + `codegen.fallback=false`
  * turn that silent demotion into a loud failure, so this suite pins
  * compilability for every custom expression in one place.
  */
class CodegenOnlySpec extends SparkTestBase {

  private def codegenOnly[A](f: org.apache.spark.sql.SparkSession => A): A = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s2.conf.set("spark.sql.codegen.fallback", "false")
    f(s2)
  }

  test("all custom expressions compile under CODEGEN_ONLY (no silent " +
      "interpreted fallback)") {
    codegenOnly { s2 =>
      import s2.implicits._
      // THROUGH PARQUET, deliberately: a projection over a local Seq is
      // folded at optimization time by ConvertToLocalRelation using the
      // INTERPRETED projection — codegen never runs and a broken template
      // passes. A file scan forces the real codegen path (verified by
      // negative control: re-breaking the round-14 template fails here).
      val dir = graft.util.TempDirs.create("graft-cgonly").toString
      Seq(
        (1L, Array(1.0f, 2.0f, 3.0f), Array(1L, 2L, 3L), "hello world", 3L, 5L),
        (2L, Array(0.5f, 0.1f, 0.9f), Array(1L, 9L, 3L), "hullo wxrld", 7L, 2L)
      ).toDF("id", "v", "sig", "txt", "xi", "yi")
        .write.mode("overwrite").parquet(dir)
      val vecs = s2.read.parquet(dir)
      val planes = Seq(Seq(1L, -2L, 3L), Seq(2L, 2L, -1L))
      val out = vecs.select(
        VectorFunctions.cosine_sim(col("v"), col("v")).as("cos"),
        VectorFunctions.sq_l2_distance(col("v"), col("v")).as("l2"),
        VectorFunctions.l1_distance(col("v"), col("v")).as("l1"),
        VectorFunctions.match_fraction(col("sig"), col("sig")).as("mf"),
        VectorFunctions.hyperplane_chunks(col("sig"), planes, 2).as("hc"),
        TextFunctions.poly_hash(col("txt")).as("ph"),
        TextFunctions.char_entropy(col("txt")).as("ce"),
        TextFunctions.char_distinct(col("txt")).as("cd"),
        TextFunctions.nfc_normalize(col("txt")).as("nfc"),
        ZOrderFunctions.zorder2(col("xi"), col("yi")).as("z"),
        JaroWinklerFunctions.jaro_winkler(col("txt"), lit("hello world")).as("jw"),
        LevenshteinFunctions.lev_within(col("txt"), lit("hello world"), 3).as("lw"),
        graft.functions.SetFunctions.sorted_intersect_count(
          sort_array(col("sig")), sort_array(col("sig"))).as("sic")
      ).collect()
      assert(out.length == 2)
      val r = out.find(_.getAs[Double]("cos") > 0.99).get
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
      assert(r.getAs[Double]("l2") == 0.0 && r.getAs[Double]("l1") == 0.0)
      assert(r.getAs[Double]("mf") == 1.0)
      assert(r.getAs[Long]("ph") > 0)
      assert(r.getAs[Double]("jw") == 1.0)
      assert(r.getAs[Int]("sic") == 3)
      // the tokenizer Generator (CodegenFallback by design) still plans
      // under CODEGEN_ONLY — the mode gates projections, not generators
      val toks = vecs.select(TextFunctions.tokenize(col("txt"), " "))
        .count()
      assert(toks == 4)
    }
  }

  test("NULL-element parity survives CODEGEN_ONLY (the round-14 template " +
      "fix compiles, not just falls back correctly)") {
    codegenOnly { s2 =>
      import s2.implicits._
      val dir = graft.util.TempDirs.create("graft-cgonly-null").toString
      Seq((1L, Array[java.lang.Float](1.0f, null, 3.0f)))
        .toDF("id", "v").write.mode("overwrite").parquet(dir)
      val r = s2.read.parquet(dir).select(
        VectorFunctions.cosine_sim(col("v"), col("v"))).collect().head
      assert(r.isNullAt(0))
    }
  }
}
