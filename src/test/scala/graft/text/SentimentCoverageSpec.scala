package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 lexicon-widening gate (VERDICT r8 item 4): the scorer's
  * contract was always honored, but ~60 entries hit real English far
  * less often than TextBlob's ~2,900-entry lexicon the reference uses
  * (demo.py:162). This spec pins:
  *  - the coverage GAIN: on a fixture vocabulary of common
  *    review/tweet sentiment words, the widened lexicon must score a
  *    large majority nonzero, and materially more than the frozen
  *    round-8 core alone did;
  *  - the golden-range invariant: every entry in [-1000, 1000]
  *    per-mille, so an unmodified single-token score stays within
  *    TextBlob's polarity domain [-1, 1] (the reference's observed
  *    output range is [-0.75, 1.0], BASELINE.md);
  *  - structural hygiene: no entry collides with the negator or
  *    intensifier sets (a word can't be both a hit and a modifier of
  *    the next token under the scorer's one-pass rule), and the
  *    duplicate guard in the lexicon builder stays armed.
  */
class SentimentCoverageSpec extends AnyFunSuite {

  /** Common sentiment-bearing words a review/tweet corpus actually
    * uses — deliberately NOT copied from the lexicon source lists;
    * assembled independently so coverage measures vocabulary reach,
    * not self-agreement. */
  private val fixtureVocab: Seq[String] = Seq(
    // praise
    "outstanding", "superb", "brilliant", "incredible", "fabulous",
    "terrific", "stunning", "gorgeous", "lovely", "delightful",
    "pleasant", "impressive", "charming", "elegant", "refreshing",
    "satisfying", "inspiring", "cheerful", "joyful", "thrilled",
    "pleased", "grateful", "glad", "excited", "friendly",
    "helpful", "reliable", "honest", "generous", "kind",
    "smart", "clever", "wise", "creative", "efficient",
    "comfortable", "cozy", "peaceful", "spotless", "juicy",
    "yummy", "flavorful", "affordable", "valuable", "useful",
    "convenient", "easy", "quick", "timely", "modern",
    "recommend", "enjoy", "appreciate", "impressed", "thanks",
    "congrats", "wow", "successful", "victory", "masterpiece",
    // condemnation
    "atrocious", "dreadful", "appalling", "vile", "pathetic",
    "miserable", "lousy", "shoddy", "garbage", "worthless",
    "useless", "hopeless", "unpleasant", "ugly", "filthy",
    "smelly", "rotten", "bland", "tasteless", "rude",
    "annoying", "irritating", "frustrating", "dull", "gloomy",
    "depressing", "unhappy", "heartbroken", "upset", "worried",
    "scared", "terrified", "uncomfortable", "embarrassing", "dishonest",
    "misleading", "unreliable", "unsafe", "dangerous", "toxic",
    "broken", "defective", "faulty", "buggy", "unusable",
    "sloppy", "incompetent", "mediocre", "inferior", "failed",
    "disaster", "tragic", "confusing", "difficult", "cruel",
    "unfair", "painful", "disappointed", "furious", "overpriced",
    "scam", "fraud", "problem", "error", "mistake",
    "crash", "delayed", "late", "waste", "ruined")

  private def coverage(lex: Map[String, Int]): Double =
    fixtureVocab.count(w => lex.getOrElse(w, 0) != 0).toDouble /
      fixtureVocab.size

  test("widened lexicon covers the fixture vocabulary") {
    val full = coverage(Sentiment.lexicon)
    val coreOnly = coverage(Sentiment.core.toMap)
    // the frozen core alone reaches almost none of this vocabulary;
    // the widened lexicon must reach nearly all of it
    assert(coreOnly < 0.10, f"core coverage $coreOnly%.2f — fixture " +
      "vocabulary overlaps the frozen core more than designed")
    assert(full >= 0.90, f"widened coverage $full%.2f < 0.90")
  }

  test("lexicon is materially wider than the round-8 core") {
    assert(Sentiment.lexicon.size >= 650,
      s"lexicon shrank to ${Sentiment.lexicon.size} entries")
  }

  test("every polarity is per-mille in [-1000, 1000]") {
    val bad = Sentiment.lexicon.filter { case (_, v) => v < -1000 || v > 1000 }
    assert(bad.isEmpty, s"out-of-range entries: $bad")
  }

  test("core values stay frozen (oracle-history pins)") {
    val m = Sentiment.lexicon
    assert(m("good") == 700 && m("great") == 800 && m("bad") == -700 &&
      m("terrible") == -1000 && m("right") == 286 && m("flat") == -125 &&
      m("new") == 136)
  }

  test("no lexicon entry doubles as a negator or intensifier") {
    val clash = Sentiment.lexicon.keySet
      .intersect(Sentiment.negators ++ Sentiment.intensifiers.keySet)
    assert(clash.isEmpty, s"modifier/lexicon collisions: $clash")
  }

  test("single unmodified hits stay inside TextBlob's [-1, 1] domain") {
    val extreme = Sentiment.lexicon.values.map(math.abs).max
    assert(extreme <= 1000)
    assert(Sentiment.score(Seq("atrocious")) >= -1.0)
    assert(Sentiment.score(Seq("outstanding")) <= 1.0)
  }

  test("new entries score through the full modifier pipeline") {
    assert(Sentiment.score(Seq("superb")) === 1.0)
    assert(Sentiment.score(Seq("not", "superb")) === -0.5)
    // window-2 rule (round-10): negation reaches through an intensifier
    assert(Sentiment.score(Seq("not", "very", "good")) < 0)
    assert(Sentiment.score(Seq("very", "shoddy")) === -0.78)
    assert(Sentiment.score(Seq("barely", "annoying")) === -0.36)
  }
}
