package graft.operators

/** Round-12 widening of the embedded VADER lexicon transcription
  * (reference F1, producer_news.py:10-17): ~83 additional
  * (word -> valence) entries for published-lexicon words found missing by
  * a membership probe of ~1,540 common English sentiment words against
  * the embedded merge. Two sourcing tiers, both documented here because
  * the container is zero-egress and ships no copy of the published file:
  *
  *  - CALIBRATED: `uncompelling` is solved EXACTLY from the published
  *    README compound for "The plot was good, but the characters are
  *    uncompelling and the dialog is not great." (-0.7042) given the
  *    sibling transcriptions (good 1.9, great 3.1, plot -0.6) and the
  *    published rule constants — the same inversion that pinned
  *    `compelling` to 0.9 from the three Roger Dodger sentences (two
  *    independent equations agree; see SentimentSpec's goldens).
  *  - FAMILY-DERIVED / RECALLED: inflections of families already
  *    transcribed (e.g. `robs` from rob/robber -2.1, `sues`/`suing` from
  *    sue/sued -1.6, `stop`/`stopped` from stops -0.6) take the family
  *    value; standalone words take the best-recalled published mean.
  *    These valences are approximate (typically within ±0.3 of the
  *    published crowd mean); membership is the high-confidence claim.
  *    For exact fidelity on all ~7.5k entries, point
  *    `graft.vader.lexicon` / `GRAFT_VADER_LEXICON` at the published
  *    MIT-licensed vader_lexicon.txt — the file seam overrides this
  *    embedded merge entirely.
  *
  * Same structural invariants as [[VaderLexiconExt]] (no overlap with any
  * other block or with boosters/negations; valences in [-4, 4]; lowercase
  * keys), enforced by VaderLexiconSpec.
  *
  * The emoticon-variant tail this scaladoc flagged as the remaining gap
  * in round 12 ("(-:", "):", ":*", ">:)" …) is transcribed in round 13's
  * [[VaderLexiconExt10]] (symbol faces + leetspeak + rated acronym slang,
  * with its own tier accounting). Sentiment-free fillers the round-12 probe
  * also flagged ("hmm", "idk", "um") are CORRECTLY absent — the published
  * lexicon only carries nonzero-mean tokens — and "nope" is excluded by
  * the negation-disjointness invariant, as published VADER treats it as a
  * negator, not a lexicon word.
  */
object VaderLexiconExt9 {

  val entries: Map[String, Double] = Map(
    // --- calibrated from published compounds ---
    "uncompelling" -> -0.7,
    // --- positive ---
    "adopts" -> 0.7, "certain" -> 1.1, "commit" -> 1.0, "commits" -> 1.1,
    "congratulation" -> 2.7, "create" -> 1.1, "created" -> 1.1,
    "decisive" -> 1.3, "ensure" -> 1.1, "favor" -> 1.7, "ha" -> 1.4,
    "holiday" -> 1.7, "interest" -> 1.5, "invulnerable" -> 1.3,
    "kudos" -> 2.3, "lovelies" -> 2.4, "luck" -> 1.9, "outgoing" -> 1.4,
    "played" -> 1.0, "please" -> 1.3, "pray" -> 1.4, "praying" -> 1.4,
    "prepared" -> 1.0, "proactive" -> 1.6, "relax" -> 1.9,
    "responsible" -> 1.4, "shared" -> 1.2, "shares" -> 1.2,
    "surprise" -> 1.4, "surprised" -> 1.2, "surprising" -> 1.3,
    "value" -> 1.4, "wanted" -> 0.3, "well" -> 1.1, "wish" -> 1.7,
    "wishes" -> 1.6, "wishing" -> 1.6, "woo" -> 2.1, "worth" -> 0.9,
    // --- negative ---
    "cut" -> -1.1, "cutting" -> -0.9, "demand" -> -0.5,
    "demanded" -> -0.7, "denier" -> -1.3, "disabling" -> -1.3,
    "divided" -> -0.8, "forget" -> -0.9, "hard" -> -0.4,
    "huckster" -> -1.2, "hypocritical" -> -2.1, "insipid" -> -1.8,
    "limits" -> -0.6, "lowest" -> -1.3, "mope" -> -1.4, "pained" -> -1.8,
    "profiteer" -> -1.6, "pushy" -> -1.3, "questioned" -> -1.0,
    "ranter" -> -1.4, "rig" -> -1.0, "rigged" -> -1.5, "robs" -> -2.1,
    "sigh" -> -1.1, "stop" -> -0.6, "stopped" -> -0.6, "strikes" -> -1.0,
    "sues" -> -1.6, "suing" -> -1.6, "sulky" -> -1.4, "swindles" -> -2.2,
    "tears" -> -1.0, "totalitarianism" -> -2.2, "treasonous" -> -2.3,
    "tricky" -> -0.5, "tumor" -> -1.9, "twat" -> -2.6, "weapon" -> -1.9,
    "weapons" -> -1.9, "whines" -> -1.4, "whore" -> -2.3,
    "wrathful" -> -2.3, "zealots" -> -1.4)
}
