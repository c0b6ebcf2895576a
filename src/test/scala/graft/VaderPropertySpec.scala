package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sentiment, VaderData}

/** Property-level guards on the VADER rule engine over the FULL widened
  * lexicon (~7k entries). The golden tests in SentimentSpec pin exact
  * published values on a handful of sentences; these properties check the
  * rule machinery holds for ANY lexicon word — so a lexicon widening
  * (new entry families, emoticons, slang) cannot silently break a rule
  * path the goldens happen not to exercise. Seeded deterministic sampling
  * (no scalatest-scalacheck bridge in the offline cache; reproducibility
  * beats shrinking here).
  */
class VaderPropertySpec extends AnyFunSuite {

  // alphabetic lexicon words only: emoticon keys (":-)") interact with the
  // punctuation stripper and the "n't" negation substring check differently
  private val words: Vector[String] =
    VaderData.lexicon.keys.filter(w => w.forall(_.isLetter) && w.length > 2)
      .toVector.sorted
  private val posWords = words.filter(w => VaderData.lexicon(w) > 0.5)
  private val negWords = words.filter(w => VaderData.lexicon(w) < -0.5)

  private def sample(xs: Vector[String], n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(xs(rnd.nextInt(xs.size)))
  }

  test("compound stays in [-1, 1] for any sequence of lexicon words") {
    val rnd = new scala.util.Random(41)
    (1 to 300).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(24))(words(rnd.nextInt(words.size)))
        .mkString(" ")
      val c = Sentiment.score(s)
      assert(c >= -1.0 && c <= 1.0, s"out of range for '$s': $c")
    }
  }

  test("single positive word scores > 0, single negative < 0") {
    sample(posWords, 300, 42).foreach { w =>
      assert(Sentiment.score(w) > 0.0, s"'$w' (${VaderData.lexicon(w)})")
    }
    sample(negWords, 300, 43).foreach { w =>
      assert(Sentiment.score(w) < 0.0, s"'$w' (${VaderData.lexicon(w)})")
    }
  }

  test("'not <word>' flips the sign of any strongly-valenced word") {
    sample(posWords, 300, 44).foreach { w =>
      assert(Sentiment.score(s"not $w") < 0.0, s"not $w")
    }
    sample(negWords, 300, 45).foreach { w =>
      assert(Sentiment.score(s"not $w") > 0.0, s"not $w")
    }
  }

  test("'very <word>' amplifies magnitude vs the bare word") {
    sample(posWords, 300, 46).foreach { w =>
      assert(Sentiment.score(s"very $w") >= Sentiment.score(w), s"very $w")
    }
    sample(negWords, 300, 47).foreach { w =>
      assert(Sentiment.score(s"very $w") <= Sentiment.score(w), s"very $w")
    }
  }

  test("trailing '!' never weakens the score of a valenced word") {
    sample(posWords, 300, 48).foreach { w =>
      assert(Sentiment.score(s"$w!") >= Sentiment.score(w), s"$w!")
    }
    sample(negWords, 300, 49).foreach { w =>
      assert(Sentiment.score(s"$w!") <= Sentiment.score(w), s"$w!")
    }
  }

  test("ALL-CAPS emphasis amplifies in mixed-case context") {
    // the caps differential only fires when the sentence is NOT uniformly
    // cased — pair the target with a lowercase neutral word
    sample(posWords, 300, 50).foreach { w =>
      assert(Sentiment.score(s"the ${w.toUpperCase}") >=
        Sentiment.score(s"the $w"), w)
    }
  }

  test("scoring is deterministic (same text, same compound)") {
    val rnd = new scala.util.Random(51)
    (1 to 100).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(24))(words(rnd.nextInt(words.size)))
        .mkString(" ")
      assert(Sentiment.score(s) == Sentiment.score(s), s)
    }
  }
}
