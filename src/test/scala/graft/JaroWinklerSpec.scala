package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JaroWinklerFunctions, JaroWinklerUtil}

/** Pins [[JaroWinklerUtil]] to DuckDB's `jaro_winkler_similarity`
  * semantics (probed directly against DuckDB 2026-08; the q_jaro_winkler
  * oracle re-verifies on corpus data every round).
  */
class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook golden values match DuckDB") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("small bolt", "small widget") - 0.8566666666666667)
      < 1e-12)
    assert(math.abs(jw("aaapppp", "ap") - 0.7857142857142857) < 1e-12)
    // odd out-of-order count: DuckDB floors t (1, not 1.5) — probed value
    assert(math.abs(jw("large gear", "red gear") - 0.8107142857142856)
      < 1e-12)
  }

  test("boost gate: no Winkler prefix bonus at jaro <= 0.7") {
    // DuckDB: jw('abcdefgh','abzzzzzz') == jaro == 0.5 (2-char prefix
    // would otherwise boost to 0.6)
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
  }

  test("edge conventions match DuckDB: empties are 0, window-0 swaps are 0") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("ab", "ba") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "a") == 1.0)
  }

  test("symmetric, bounded, and codegen path equals interpreted path") {
    val pairs = Seq(("martha", "marhta"), ("crate", "trace"),
      ("dixon", "dicksonx"), ("hello", "hallo"), ("abc", "xyz"))
    pairs.foreach { case (a, b) =>
      val s = jw(a, b)
      assert(s == jw(b, a))
      assert(s >= 0.0 && s <= 1.0)
    }
    // codegen path == interpreted path, on a corpus-backed plan (a local
    // relation would constant-fold before codegen)
    val df = graft.sources.Tables.part(spark, "/root/testdata/sf0.001")
      .limit(50)
      .withColumn("jw", JaroWinklerFunctions
        .jaro_winkler(col("p_name"), col("p_brand")))
    val rows = df.select("p_name", "p_brand", "jw").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("jw") == jw(r.getString(0), r.getString(1)))
    }
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty,
      df.queryExecution.executedPlan.toString)
  }
}
