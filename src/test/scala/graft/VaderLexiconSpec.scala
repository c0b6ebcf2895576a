package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sentiment, VaderData, VaderLexiconExt, VaderLexiconExt2, VaderLexiconExt3, VaderLexiconExt4, VaderLexiconExt5, VaderLexiconExt6, VaderLexiconExt7, VaderLexiconExt8, VaderLexiconExt9, VaderLexiconExt10, VaderLexiconExt11}

/** Structural invariants of the three-block embedded lexicon (core +
  * round-10 widenings). These are SEMANTIC guards, not style checks: a
  * lexicon entry that shadows a booster/negation word changes rule
  * behavior at that token slot (the scorer suppresses booster/negation
  * handling when the preceding word is in the lexicon), and a cross-block
  * key collision would silently last-wins-overwrite a transcribed valence.
  */
class VaderLexiconSpec extends AnyFunSuite {

  private val blocks = Seq(
    "core" -> VaderData.coreLexicon.keySet,
    "ext" -> VaderLexiconExt.entries.keySet,
    "ext2" -> VaderLexiconExt2.entries.keySet,
    "ext3" -> VaderLexiconExt3.entries.keySet,
    "ext4" -> VaderLexiconExt4.entries.keySet,
    "ext5" -> VaderLexiconExt5.entries.keySet,
    "ext6" -> VaderLexiconExt6.entries.keySet,
    "ext7" -> VaderLexiconExt7.entries.keySet,
    "ext8" -> VaderLexiconExt8.entries.keySet,
    "ext9" -> VaderLexiconExt9.entries.keySet,
    "ext10" -> VaderLexiconExt10.entries.keySet,
    "ext11" -> VaderLexiconExt11.entries.keySet)

  test("no pair of lexicon blocks overlaps (no silent shadowing)") {
    for {
      Seq((na, a), (nb, b)) <- blocks.combinations(2)
      overlap = a & b
    } assert(overlap.isEmpty, s"$na/$nb collision: $overlap")
  }

  test("no lexicon word is also a booster or negation (rule semantics)") {
    val lex = VaderData.lexicon.keySet
    val boosterHits = lex & VaderData.boosters.keySet
    val negHits = lex & VaderData.negations
    assert(boosterHits.isEmpty, s"lexicon∩boosters: $boosterHits")
    // "no" IS deliberately in the lexicon (VADER's special case, handled
    // explicitly in scoreing); everything else must stay disjoint
    assert((negHits - "no").isEmpty, s"lexicon∩negations: ${negHits - "no"}")
  }

  test("valences stay on the published [-4, 4] mean-rating scale") {
    val bad = VaderData.lexicon.filter { case (_, v) => v < -4.0 || v > 4.0 }
    assert(bad.isEmpty, s"out-of-scale valences: $bad")
  }

  test("merged lexicon covers >= 7000 entries and all blocks contribute") {
    assert(VaderData.lexicon.size >= 7000,
      s"merged size ${VaderData.lexicon.size}")
    assert(VaderData.lexicon.size == blocks.map(_._2.size).sum)
  }

  test("widened words score with full rule machinery (booster + negation)") {
    // all four words are ext-block entries — OOV before round 10
    assert(Sentiment.score("an outstanding achievement") > 0.5)
    assert(Sentiment.score("a catastrophic failure of oversight") < -0.5)
    assert(Sentiment.score("very disturbing allegations") <
      Sentiment.score("disturbing allegations")) // booster amplifies
    assert(Sentiment.score("not hopeless") > 0) // negation flips

    // ext2-block entries (OOV before this widening) through the same rules
    assert(Sentiment.score("a heartwarming recovery") > 0.5)
    assert(Sentiment.score("an absolutely devastating betrayal") < -0.5)
    assert(Sentiment.score("very misleading claims") <
      Sentiment.score("misleading claims"))
    assert(Sentiment.score("not hostile") > 0)

    // ext3-block entries: informal tokens + emoticons survive the
    // punctuation stripper (<=2-char rule keeps pure-punct tokens intact)
    assert(Sentiment.score("haha that was exemplary") > 0.5)
    assert(Sentiment.score("ugh what a dud") < -0.5)
    assert(Sentiment.score("miss you <3") > 0)
    assert(Sentiment.score("my team lost :-(") < 0)

    // ext4-block entries (f-z families) through the same rules
    assert(Sentiment.score("a lucrative and seamless launch") > 0.5)
    assert(Sentiment.score("an utterly reprehensible scam") < -0.5)
    assert(Sentiment.score("extremely worrisome signals") <
      Sentiment.score("worrisome signals"))
    assert(Sentiment.score("not pointless") > 0)
  }

  test("lowercase keys only (scorer lowercases tokens before lookup)") {
    val nonLower = VaderData.lexicon.keys.filter(w => w != w.toLowerCase)
    assert(nonLower.isEmpty, s"non-lowercase keys: $nonLower")
  }

  test("sampled valences stay at their transcribed values (edit tripwire)") {
    // One pin per block family, strongest-valence words included: a future
    // bulk edit (scale change, sign flip, block merge) trips immediately.
    val pins = Map(
      "awesome" -> 3.1, "awful" -> -2.0, "beautiful" -> 2.9,
      "best" -> 3.2, "kill" -> -3.7, "murder" -> -3.4,
      "free" -> 1.9, "freedom" -> 2.3, "happy" -> 2.7,
      "betrayal" -> -2.8, "heartwarming" -> 2.6, "lmao" -> 2.4,
      "wtf" -> -2.2, "reprehensible" -> -2.3, "lucrative" -> 1.9,
      "feast" -> 1.7, "cold" -> -0.9)
    pins.foreach { case (w, v) =>
      assert(VaderData.lexicon.get(w).contains(v),
        s"'$w': got ${VaderData.lexicon.get(w)}, pinned $v")
    }
  }
}
