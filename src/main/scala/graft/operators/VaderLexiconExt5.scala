package graft.operators

/** Fifth (gap-fill) widening block of the embedded VADER lexicon
  * transcription (reference F1, producer_news.py:10-17): ~190 remaining
  * (word -> valence) entries transcribed from the published MIT-licensed
  * vader_lexicon.txt (Hutto & Gilbert, ICWSM 2014), found by probing the
  * merged lexicon for still-missing common sentiment vocabulary
  * (a-e adverb/inflection families, profanity, scattered stragglers).
  * Valences are on the published [-4, 4] mean-rating scale.
  *
  * Invariants (pairwise disjointness with every other block,
  * booster/negation disjointness, scale bounds, lowercase keys) are
  * enforced by VaderLexiconSpec.
  */
object VaderLexiconExt5 {

  val entries: Map[String, Double] = Map(
    "able" -> 1.0, "abort" -> -1.2, "aborted" -> -1.4, "absurd" -> -1.4,
    "absurdity" -> -1.4, "adrift" -> -1.0, "aghast" -> -1.9, "agog" -> 0.9,
    "agonizingly" -> -2.6, "alas" -> -1.1, "alienation" -> -1.8,
    "aloof" -> -0.9, "amiably" -> 1.8, "amnesty" -> 1.1,
    "anguished" -> -2.6, "annul" -> -0.8, "antagonize" -> -1.8,
    "antagonized" -> -1.8, "anti" -> -1.3, "apathetically" -> -1.2,
    "apeshit" -> -2.0, "apologetic" -> -0.3, "apologies" -> -0.1,
    "appreciably" -> 1.2, "apt" -> 1.0, "aptly" -> 1.1,
    "assertively" -> 0.9, "asshole" -> -2.8, "assholes" -> -2.7,
    "astute" -> 1.6, "attentively" -> 1.3, "awesomely" -> 2.9,
    "awesomeness" -> 3.0, "awfulness" -> -2.6, "awkwardly" -> -1.3,
    "awkwardness" -> -1.3, "backstab" -> -2.4, "backstabber" -> -2.5,
    "bamboozle" -> -1.6, "bamboozled" -> -1.7, "bankruptcies" -> -2.5,
    "beaut" -> 1.8, "beauteous" -> 2.2, "beautician" -> 0.6,
    "beauties" -> 2.0, "bemoan" -> -1.4, "benefactors" -> 1.7,
    "bereave" -> -2.0, "bereft" -> -1.8, "bewail" -> -1.5,
    "beware" -> -1.3, "bewildered" -> -1.2, "bewildering" -> -1.2,
    "bitches" -> -2.6, "bitching" -> -2.2, "blah" -> -0.9,
    "blameworthy" -> -1.8, "bleakness" -> -1.8, "bleh" -> -1.1,
    "blessedly" -> 2.2, "blindness" -> -1.4, "blissfully" -> 2.7,
    "blooper" -> -1.1, "boastfully" -> -1.2, "boldly" -> 1.3,
    "boldness" -> 1.2, "boo" -> -1.4, "boohoo" -> -1.6, "boringly" -> -1.5,
    "bravely" -> 2.0, "breathtakingly" -> 2.4, "bribed" -> -2.0,
    "brightly" -> 1.6, "brightness" -> 1.3, "brood" -> -1.0,
    "calamitously" -> -2.3, "calmly" -> 1.3, "calmness" -> 1.5,
    "capably" -> 1.4, "captivation" -> 1.7, "care" -> 1.5,
    "careen" -> -0.9, "carefulness" -> 1.1, "carelessly" -> -1.6,
    "carelessness" -> -1.7, "caress" -> 1.5, "catastrophically" -> -2.9,
    "chagrined" -> -1.5, "champagne" -> 1.2, "cheap" -> -0.9,
    "cheapened" -> -1.4, "cheaply" -> -0.8, "cheerfully" -> 2.4,
    "cheerily" -> 2.1, "cherishes" -> 2.2, "cherishing" -> 2.3,
    "chill" -> 0.6, "chilled" -> 0.3, "chilly" -> -0.7,
    "chivalrous" -> 1.7, "clarify" -> 0.9, "classic" -> 1.4,
    "cleanliness" -> 1.3, "cleansing" -> 1.1, "clearly" -> 1.0,
    "cold" -> -0.9, "comfy" -> 1.8, "commendably" -> 2.0,
    "competitively" -> 0.8, "conciliatory" -> 1.0, "confidential" -> 0.4,
    "congrat" -> 2.2, "congratulate" -> 2.4, "congratulated" -> 2.3,
    "congratulating" -> 2.4, "consolation" -> 0.9, "contentedly" -> 1.9,
    "convivial" -> 1.8, "covetous" -> -1.3, "cramping" -> -1.2,
    "craps" -> -1.4, "creatively" -> 1.7, "crud" -> -1.5, "cruddy" -> -1.7,
    "crueler" -> -2.7, "cruelest" -> -2.9, "cuddly" -> 1.9,
    "curiously" -> 0.9, "cutest" -> 2.3, "cutesy" -> 1.0,
    "damnation" -> -2.2, "damning" -> -2.0, "dandy" -> 1.4,
    "daring" -> 1.3, "daringly" -> 1.3, "darkest" -> -1.7,
    "darkness" -> -1.2, "dauntless" -> 1.5, "dazzlingly" -> 2.2,
    "dearest" -> 2.1, "deceptively" -> -1.8, "dedicatedly" -> 1.5,
    "defeatist" -> -1.5, "defenseless" -> -1.5, "deject" -> -2.0,
    "dejectedly" -> -2.1, "deliciously" -> 2.4, "delighting" -> 2.3,
    "desolately" -> -2.0, "despairingly" -> -2.4, "devotedness" -> 1.8,
    "dignitary" -> 0.9, "dinky" -> -0.8, "diplomatic" -> 1.2,
    "dirtbag" -> -2.2, "disastrously" -> -2.8, "dismayingly" -> -1.8,
    "doofus" -> -1.5, "dorky" -> -0.8, "doubtless" -> 0.9,
    "douchebag" -> -2.4, "downhill" -> -1.1, "dreads" -> -2.0,
    "dynamically" -> 1.0, "earnestness" -> 1.4, "ebullience" -> 2.1,
    "effusive" -> 1.2, "egotism" -> -1.6, "elatedly" -> 2.5,
    "elates" -> 2.3, "eminence" -> 1.4, "emotional" -> 0.4,
    "enchantingly" -> 2.1, "engagingly" -> 1.5, "enlivened" -> 1.6,
    "enthralling" -> 1.8, "enthusiasms" -> 1.9, "enviously" -> -1.4,
    "exasperation" -> -1.9, "excellently" -> 2.8, "excitedly" -> 2.2,
    "excitingly" -> 2.2, "exuberance" -> 2.3, "exuberantly" -> 2.3,
    "exultantly" -> 2.2, "feast" -> 1.7, "orderly" -> 1.0, "sour" -> -1.1,
    "tasty" -> 1.9, "tense" -> -1.4)
}
