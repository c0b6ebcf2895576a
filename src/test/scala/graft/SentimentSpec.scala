package graft

import graft.operators.Sentiment

/** Pins the VADER-style scorer: sign correctness, negation flip, booster
  * amplification, exclamation emphasis, empty-content fallback, bounds.
  */
class SentimentSpec extends SparkTestBase {

  test("positive and negative sentences get the right sign") {
    assert(Sentiment.score("bitcoin made a great gain today") > 0.3)
    assert(Sentiment.score("terrible crash wiped out the market") < -0.3)
    assert(Sentiment.score("the protocol processes blocks") == 0.0) // neutral
  }

  test("negation flips polarity (VADER n_scalar -0.74)") {
    val pos = Sentiment.score("this is good")
    val neg = Sentiment.score("this is not good")
    assert(pos > 0 && neg < 0)
    assert(math.abs(neg) < math.abs(pos)) // damped, not mirrored
  }

  test("booster amplifies (VADER b_incr 0.293)") {
    assert(Sentiment.score("very good news") > Sentiment.score("good news"))
    assert(Sentiment.score("extremely bad loss") < Sentiment.score("bad loss"))
  }

  test("exclamation emphasis, capped at 4") {
    val base = Sentiment.score("great gain")
    val one = Sentiment.score("great gain!")
    val five = Sentiment.score("great gain!!!!!")
    val four = Sentiment.score("great gain!!!!")
    assert(one > base)
    assert(five == four) // cap
  }

  test("empty / null / blank content scores 0.0 (scrape-failure fallback)") {
    assert(Sentiment.score("") == 0.0)
    assert(Sentiment.score(null) == 0.0)
    assert(Sentiment.score("   ") == 0.0)
  }

  test("compound stays in [-1, 1] even for long rants") {
    val rant = Seq.fill(50)("terrible awful crash loss fear panic").mkString(" ")
    val s = Sentiment.score(rant)
    assert(s >= -1.0 && s <= 1.0 && s < -0.95)
  }

  test("UDF column form works in a query") {
    import spark.implicits._
    val out = Seq("great win", "bad crash").toDF("text")
      .select(Sentiment.sentiment($"text").as("s"))
      .as[Double].collect()
    assert(out(0) > 0 && out(1) < 0)
  }
}
