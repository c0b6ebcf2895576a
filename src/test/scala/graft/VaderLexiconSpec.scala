package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sentiment, VaderData, VaderLexiconExt}

/** Structural invariants of the two-block embedded lexicon (core +
  * round-10 widening). These are SEMANTIC guards, not style checks: a
  * lexicon entry that shadows a booster/negation word changes rule
  * behavior at that token slot (the scorer suppresses booster/negation
  * handling when the preceding word is in the lexicon), and a
  * core/ext key collision would silently last-wins-overwrite a
  * transcribed valence.
  */
class VaderLexiconSpec extends AnyFunSuite {

  test("ext block does not overlap the core block (no silent shadowing)") {
    val overlap = VaderData.coreLexicon.keySet & VaderLexiconExt.entries.keySet
    assert(overlap.isEmpty, s"core/ext collision: $overlap")
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

  test("merged lexicon covers >= 1200 entries and both blocks contribute") {
    assert(VaderData.lexicon.size >= 1200,
      s"merged size ${VaderData.lexicon.size}")
    assert(VaderData.lexicon.size ==
      VaderData.coreLexicon.size + VaderLexiconExt.entries.size)
  }

  test("widened words score with full rule machinery (booster + negation)") {
    // all four words are ext-block entries — OOV before round 10
    assert(Sentiment.score("an outstanding achievement") > 0.5)
    assert(Sentiment.score("a catastrophic failure of oversight") < -0.5)
    assert(Sentiment.score("very disturbing allegations") <
      Sentiment.score("disturbing allegations")) // booster amplifies
    assert(Sentiment.score("not hopeless") > 0) // negation flips
  }

  test("lowercase keys only (scorer lowercases tokens before lookup)") {
    val nonLower = VaderData.lexicon.keys.filter(w => w != w.toLowerCase)
    assert(nonLower.isEmpty, s"non-lowercase keys: $nonLower")
  }
}
