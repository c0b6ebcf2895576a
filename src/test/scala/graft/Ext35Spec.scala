package graft

import graft.queries.Ext35Queries

/** Semantic invariants for SAX + quantile normalization. */
class Ext35Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("sax word: alphabet only {a,b,c,d}, length equals day count, and " +
    "all four letters appear somewhere (z-normalized series must span " +
    "the quartiles)") {
    val rows = Ext35Queries.saxWord(spark, sf).collect()
    assert(rows.nonEmpty)
    val allLetters = rows.map(_.getAs[String]("sax_word")).mkString
    rows.foreach { r =>
      val w = r.getAs[String]("sax_word")
      assert(w.length == r.getAs[Long]("n_days"))
      assert(w.forall("abcd".contains(_)), s"bad letter in $w")
    }
    assert("abcd".forall(allLetters.contains(_)),
      "a z-normalized series that never leaves one quartile is broken")
  }

  test("quantile normalize: after-means collapse toward each other " +
    "(cross-type spread shrinks) and min_types_at_rank >= 1") {
    val rows = Ext35Queries.quantileNormalize(spark, sf).collect()
    assert(rows.length >= 2)
    def spread(xs: Seq[Double]) = xs.max - xs.min
    val before = spread(rows.map(_.getAs[Double]("mean_before")).toSeq)
    val after = spread(rows.map(_.getAs[Double]("mean_after")).toSeq)
    assert(after < math.max(before * 0.01, 1e-5),
      s"normalization must collapse the spread: $before -> $after")
    rows.foreach { r =>
      assert(r.getAs[Long]("min_types_at_bucket") == rows.length.toLong,
        "every type must populate every bucket")
      assert(r.getAs[Double]("max_shift") > 0,
        "a type whose quantile function never moved is suspicious")
    }
  }
}
