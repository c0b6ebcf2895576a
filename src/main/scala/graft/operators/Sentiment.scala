package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** VADER-style rule-based sentiment scorer (reference F1: the producer scores
  * article bodies with NLTK VADER's compound score, producer_news.py:10-17,
  * 71-74). This is an independent Scala implementation of the PUBLISHED
  * algorithm (Hutto & Gilbert 2014, MIT-licensed lexicon): lexicon valences,
  * booster amplification, negation flipping, exclamation emphasis, and the
  * alpha-15 compound normalization. The embedded lexicon is a compact subset
  * with the published valences — deterministic, so goldens are stable.
  *
  * Kept as a Scala UDF by design: the control flow (backward negation scan)
  * is genuinely imperative; SURVEY.md §2.9 rates a UDF sufficient for parity.
  */
object Sentiment {

  /** (word -> valence) — values from the published vader_lexicon.txt. */
  val lexicon: Map[String, Double] = Map(
    "good" -> 1.9, "great" -> 3.1, "excellent" -> 2.7, "amazing" -> 2.8,
    "awesome" -> 3.1, "best" -> 3.2, "better" -> 1.9, "positive" -> 2.3,
    "profit" -> 2.0, "gain" -> 2.4, "gains" -> 2.4, "win" -> 2.8,
    "wins" -> 2.7, "up" -> 0.9, "rise" -> 1.2, "rose" -> 1.1,
    "surge" -> 1.4, "rally" -> 1.5, "boom" -> 1.4, "bull" -> 1.1,
    "bullish" -> 1.6, "strong" -> 2.3, "growth" -> 2.4, "success" -> 2.7,
    "love" -> 3.2, "happy" -> 2.7, "optimistic" -> 1.7, "recover" -> 1.4,
    "bad" -> -2.5, "terrible" -> -2.1, "awful" -> -2.0, "worst" -> -3.1,
    "worse" -> -2.1, "negative" -> -2.7, "loss" -> -1.3, "losses" -> -1.7,
    "lose" -> -2.0, "crash" -> -2.5, "plunge" -> -1.2, "drop" -> -1.1,
    "fall" -> -1.2, "fell" -> -1.0, "fear" -> -2.2, "panic" -> -2.4,
    "bear" -> -0.4, "bearish" -> -1.4, "weak" -> -1.8, "fraud" -> -2.8,
    "scam" -> -2.3, "risk" -> -1.1, "crisis" -> -3.1, "collapse" -> -2.1,
    "hate" -> -2.7, "sad" -> -2.1, "decline" -> -1.6, "doubt" -> -1.5)

  /** Degree modifiers (published booster_dict values, scalar 0.293). */
  val boosters: Map[String, Double] = Map(
    "very" -> 0.293, "extremely" -> 0.293, "really" -> 0.293,
    "hugely" -> 0.293, "incredibly" -> 0.293, "totally" -> 0.293,
    "slightly" -> -0.293, "somewhat" -> -0.293, "barely" -> -0.293,
    "hardly" -> -0.293, "marginally" -> -0.293)

  val negations: Set[String] = Set(
    "not", "no", "never", "none", "cannot", "cant", "dont", "doesnt",
    "didnt", "isnt", "wasnt", "wont", "without", "neither", "nor")

  private val NegationScalar = -0.74
  private val Alpha = 15.0

  /** Compound score in [-1, 1]; 0.0 for empty/blank content (the reference's
    * scrape-failure fallback, producer_news.py:72-74).
    */
  def score(text: String): Double = {
    if (text == null || text.trim.isEmpty) return 0.0
    val toks = text.toLowerCase
      .replaceAll("[^a-z]+", " ")
      .split(" ").filter(_.nonEmpty)

    var sum = 0.0
    toks.zipWithIndex.foreach { case (tok, i) =>
      lexicon.get(tok).foreach { valence0 =>
        var valence = valence0
        // booster in the 3 preceding tokens, damped by distance (published
        // 0.95/0.9 scalars for distance 2/3)
        (1 to 3).foreach { d =>
          if (i - d >= 0) {
            val prev = toks(i - d)
            if (!lexicon.contains(prev)) {
              boosters.get(prev).foreach { b =>
                val damp = d match { case 1 => 1.0; case 2 => 0.95; case 3 => 0.9 }
                valence += (if (valence >= 0) b * damp else -b * damp)
              }
            }
          }
        }
        // negation in the 3 preceding tokens flips and damps
        val negated = (1 to 3).exists(d => i - d >= 0 && negations(toks(i - d)))
        if (negated) valence *= NegationScalar
        sum += valence
      }
    }
    // exclamation emphasis (published: +0.292 per '!', max 4)
    val epCount = math.min(text.count(_ == '!'), 4)
    if (sum != 0.0) sum += math.signum(sum) * epCount * 0.292

    val compound = sum / math.sqrt(sum * sum + Alpha)
    math.max(-1.0, math.min(1.0, compound))
  }

  val scoreUdf = udf(score _)

  def sentiment(text: Column): Column = scoreUdf(text)
}
