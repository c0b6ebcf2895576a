package graft.operators

/** Round-13 widening: the published lexicon's SYMBOL-EMOTICON, leetspeak
  * and acronym-slang tail (reference F1, producer_news.py:10-17) — the
  * block the round-12 scaladoc of [[VaderLexiconExt9]] documented as the
  * last known membership gap. ~126 (token -> valence) entries transcribed
  * from the head section of the published MIT-licensed vader_lexicon.txt
  * (Hutto & Gilbert, ICWSM 2014), which sorts ASCII-betically and
  * therefore opens with the symbol faces (left-facing smiles/frowns,
  * rose/party variants), the digit-leet codes ("143" = I love you,
  * "187" = homicide, ...) and the rated acronym slang ("gr8", "h8",
  * "cwot", ...).
  *
  * Sourcing tiers (zero-egress container, no copy of the published file —
  * same discipline as [[VaderLexiconExt9]]):
  *
  *  - MEMBERSHIP is the high-confidence claim for every entry here: each
  *    token is a recalled line of the published file's head block, probed
  *    as missing from the embedded merge this round.
  *  - VALENCES are recalled crowd means; the high-traffic forms (the
  *    ":*" kiss, ":@" anger, "(:"/"):"-family, "143", "4q", "fu",
  *    "gr8", "h8", "luv") are recalled directly, the rare variants
  *    (single-digit-traffic faces like "(^;0", "..###-:") are recalled
  *    to the sign and magnitude band and may sit ±0.3 from the published
  *    mean. A face's sign is structural (smile vs frown vs sneer), so the
  *    worst realistic error is a small magnitude drift — strictly better
  *    than the pre-round-13 state where the token was OOV and scored 0.
  *  - For exact fidelity on every entry, the full-file seam
  *    (`graft.vader.lexicon` / `GRAFT_VADER_LEXICON`,
  *    [[Sentiment.active]]) overrides this embedded merge entirely; the
  *    file path is round-trip-tested in SentimentSpec.
  *
  * CASE-COLLAPSE accounting (documented tokenizer-unreachable entries,
  * part of the published-count reconciliation in [[VaderData.lexicon]]'s
  * scaladoc): the published file keys some variants in uppercase —
  * "(-:O", "(:O", "D:<", "X-D", ":L", and the ":D"-class grins. The
  * published scorer lowercases the LOOKUP token but not the lexicon keys,
  * so an uppercase-keyed file entry whose lowercase twin is absent can
  * never match at all (a known quirk of the published implementation);
  * where both cases exist they carry the same mean. This transcription
  * keys everything lowercase (the reachable form, same behavior as the
  * published scorer on lowercase-keyed entries) and counts each
  * uppercase twin as one documented unreachable line. The single
  * space-containing published entry "( '}{' )" (a hug) is likewise
  * unreachable by the whitespace-splitting tokenizer on BOTH
  * implementations and is deliberately not transcribed.
  *
  * Same structural invariants as [[VaderLexiconExt]] (no overlap with any
  * other block or with boosters/negations; valences in [-4, 4]; lowercase
  * keys), enforced by VaderLexiconSpec.
  */
object VaderLexiconExt10 {

  val entries: Map[String, Double] = Map(
    // --- left-facing smiles, winks and kiss-blowing variants ---------------
    "(8" -> 2.6, "(:" -> 2.2, "(:0" -> 2.4, "(:<" -> -0.2, "(:o" -> 2.5,
    "(;" -> 1.1, "(;<" -> 0.3, "(=" -> 2.2, "(?:" -> 2.1,
    "(^:" -> 1.5, "(^;" -> 1.5, "(^;0" -> 2.0, "(^;o" -> 1.9,
    "(o:" -> 1.6, "('-:" -> 2.2, "(':" -> 2.3, "((-:" -> 2.1,
    "(-:" -> 1.6, "(-:0" -> 2.8, "(-:<" -> -0.4, "(-:o" -> 1.5,
    "(-:{" -> -0.1, "(-:|>*" -> 1.9, "(-;" -> 1.3, "(-;|" -> 2.1,
    "(*" -> 1.1, "(-%" -> -0.7, "(-*" -> 1.3, "(%" -> -0.9,
    // --- left-facing frowns ------------------------------------------------
    ")':" -> -2.0, ")-':" -> -2.1, ")-:" -> -2.1, ")-:<" -> -2.2,
    ")-:{" -> -2.1, "):" -> -1.8, "):<" -> -1.9, "):{" -> -2.3,
    ");<" -> -2.6,
    // --- misc symbol faces -------------------------------------------------
    "$:" -> -1.5, "%)" -> -0.4, "%-)" -> -1.5, "&-:" -> -0.4, "&:" -> -0.7,
    "*)" -> 0.6, "*-)" -> 0.3, "*-:" -> 2.1, "*-;" -> 2.4, "*:" -> 1.9,
    "*<|:-)" -> 1.6, "*\\0/*" -> 2.3, "*^:" -> 1.6, ",-:" -> 1.4,
    "---'-;-{@" -> 2.3, "--<--<@" -> 2.2,
    ".-:" -> -1.2, "..###-:" -> -1.7, "..###:" -> -1.9,
    "/-:" -> -1.3, "/:" -> -1.3, "/:<" -> -1.4, "/=" -> -0.9,
    "/^:" -> -1.0, "/o:" -> -1.4,
    "0-8" -> 0.1, "0-|" -> -1.2, "0:)" -> 1.9, "0:-)" -> 1.4,
    "0:-3" -> 1.5, "0:3" -> 1.9, "0;^)" -> 1.6, "0_o" -> -0.3,
    "3:(" -> -2.2, "3:)" -> 0.5, "3:-(" -> -2.3, "3:-)" -> 0.7,
    "8-d" -> 1.7, "8-o" -> -0.3, "8d" -> 2.9,
    ":###.." -> -2.4, ":$" -> -0.2, ":&" -> -0.6,
    ":*" -> 2.5, ":-*" -> 2.4, ":-@" -> -2.5, ":@" -> -2.5,
    ":l" -> -1.1, "d:<" -> -2.9, "x-d" -> 2.6,
    "=3" -> 1.3, "=[" -> -1.6, "=\\" -> -1.1, "=|" -> -0.8,
    ">.<" -> -1.3, ">:)" -> 0.4, ">:-)" -> 0.5, ">:/" -> -1.6,
    "\\m/" -> 2.2,
    // --- digit leetspeak ---------------------------------------------------
    "10q" -> 2.1, "1337" -> 2.1, "143" -> 3.2, "1432" -> 2.6,
    "14aa41" -> 2.4, "182" -> -2.9, "187" -> -3.1, "2g2b4g" -> 2.8,
    "2g2bt" -> -1.6, "2qt" -> 2.1, "4col" -> -2.2, "4q" -> -3.1,
    "5fs" -> 1.5, "86" -> -1.6,
    // --- rated acronym slang ----------------------------------------------
    "a+" -> 2.2, "cwot" -> -2.1, "fav" -> 2.0, "fu" -> -3.7,
    "fubar" -> -3.0, "gr8" -> 1.9, "h8" -> -2.7, "j4f" -> 1.4,
    "kewl" -> 1.7, "luv" -> 2.7, "muah" -> 2.5, "n1" -> 1.9,
    "pita" -> -1.8, "qt" -> 2.0, "wtg" -> 2.1,
    // --- calibrated from a published compound (the `uncompelling` method:
    // invert the published tricky-sentence score given the rule constants).
    // "Not such a badass after all." scores -0.2584 in the published
    // implementation; the only consistent derivation is badass = 1.4 as a
    // LEXICON word negated at distance 3 (1.4 x -0.74 -> -1.036 ->
    // -1.036/sqrt(1.036^2+15) = -0.2584, exact at 4 dp). The single-token
    // "badass" SPECIAL_CASES entry (1.5) is inert in the published scorer
    // too — the idiom check only matches 2-3-grams — so the word entry is
    // what actually fires. Golden pinned in SentimentSpec.
    "badass" -> 1.4,
    // "It's one thing to watch an Uwe Boll film, but another thing
    // entirely to pay for it" scores -0.2541: pay = -0.4 is the only
    // 1-dp value consistent with the full chain — entirely booster at
    // distance 2 (damped 0.95, sign-following: -0.4 - 0.278 = -0.678),
    // then the post-but x1.5 reweight (-1.0175 -> -0.2541, exact at
    // 4 dp). Golden pinned in SentimentSpec.
    "pay" -> -0.4)
}
