package graft

import org.apache.spark.sql.functions._

import graft.functions.LevenshteinFunctions.lev_within

class LevenshteinWithinSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("banded test == full levenshtein decision on real name pairs, all k") {
    val p = graft.sources.Tables.part(spark, sf)
      .select(col("p_partkey").as("ka"), col("p_name").as("na"))
    val q = graft.sources.Tables.part(spark, sf)
      .select(col("p_partkey").as("kb"), col("p_name").as("nb"))
    // bounded sample of cross pairs: 50 x 200 covers distances 0..30+
    val pairs = p.filter(col("ka") <= 50).crossJoin(q.filter(col("kb") <= 200))
    for (k <- Seq(0, 1, 4, 10)) {
      val diff = pairs.filter(
        lev_within(col("na"), col("nb"), k) =!=
          (levenshtein(col("na"), col("nb")) <= k)).count()
      assert(diff == 0, s"$diff pairs disagree with full levenshtein at k=$k")
    }
  }

  test("interpreted path (codegen off) agrees too") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val p = graft.sources.Tables.part(spark, sf)
        .select(col("p_partkey").as("ka"), col("p_name").as("na"))
      val q = graft.sources.Tables.part(spark, sf)
        .select(col("p_partkey").as("kb"), col("p_name").as("nb"))
      val diff = p.filter(col("ka") <= 30).crossJoin(q.filter(col("kb") <= 100))
        .filter(lev_within(col("na"), col("nb"), 4) =!=
          (levenshtein(col("na"), col("nb")) <= 4)).count()
      assert(diff == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("edge cases: empties, length gap, exact boundary") {
    import graft.functions.LevUtil
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    assert(LevUtil.within(u(""), u(""), 0))
    assert(LevUtil.within(u("abc"), u(""), 3))
    assert(!LevUtil.within(u("abc"), u(""), 2))
    assert(!LevUtil.within(u("abcdef"), u("a"), 4)) // length gap 5 > 4
    assert(LevUtil.within(u("kitten"), u("sitting"), 3)) // classic distance 3
    assert(!LevUtil.within(u("kitten"), u("sitting"), 2))
    assert(LevUtil.within(u("same"), u("same"), 0))
  }
}
