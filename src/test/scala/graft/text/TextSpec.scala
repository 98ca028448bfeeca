package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

class TokenizerSpec extends AnyFunSuite {
  test("punctuation split, mentions whole, hashtag split to #,word") {
    assert(Tokenizer.tokenize("Love @CocaCola's #newCoke, really!").toSeq ===
      Seq("Love", "@CocaCola", "'", "s", "#", "newCoke", ",", "really", "!"))
  }
  test("null and empty") {
    assert(Tokenizer.tokenize(null).isEmpty)
    assert(Tokenizer.tokenize("").isEmpty)
  }
  test("contractions stay attached") {
    assert(Tokenizer.tokenize("don't stop").toSeq === Seq("don't", "stop"))
  }
}

class RulerMatcherSpec extends AnyFunSuite {
  import EntityRuler._
  private val m = new Matcher(TextQueries.demoPatterns)

  test("longest match wins: 'sort merge' → Sort-Merge, not Sort+Merge") {
    assert(m.matchTokens(Array("sort", "merge", "x")).toSeq === Seq("Sort-Merge"))
  }

  test("single-token fallback when longer pattern doesn't complete") {
    assert(m.matchTokens(Array("sort", "x", "merge")).toSeq === Seq("Sort", "Merge"))
  }

  test("LOWER patterns are case-insensitive") {
    assert(m.matchTokens(Array("HASH", "Join")).toSeq === Seq("Hash Join"))
  }

  test("Text patterns are case-sensitive, distinct ids per casing") {
    assert(m.matchTokens(Array("spark")).toSeq === Seq("Spark"))
    assert(m.matchTokens(Array("Spark")).toSeq === Seq("SparkTitleCase"))
    assert(m.matchTokens(Array("SPARK")).toSeq === Seq("empty"))
  }

  test("no id → surface text emitted") {
    assert(m.matchTokens(Array("stream")).toSeq === Seq("stream"))
    assert(m.matchTokens(Array("STREAM")).toSeq === Seq("STREAM")) // surface, original case
  }

  test("structural: @mention and #hashtag emit surface") {
    assert(m.extract("ask @WaltonCoke about #needcalgon now").toSeq ===
      Seq("@WaltonCoke", "#needcalgon"))
  }

  test("dedupe + empty sentinel (ref demo.py:31-34)") {
    assert(m.matchTokens(Array("sort", "sort")).toSeq === Seq("Sort"))
    assert(m.matchTokens(Array("nothing", "here")).toSeq === Seq("empty"))
    assert(m.matchTokens(Array.empty[String]).toSeq === Seq("empty"))
  }
}

class SentimentSpec extends AnyFunSuite {
  test("lexicon average, [-1,1] range") {
    assert(Sentiment.score(Seq("good")) === 0.7)
    assert(Sentiment.score(Seq("good", "bad")) === 0.0)
    assert(Sentiment.score(Seq("nothing")) === 0.0)
  }
  test("negator flips ×-0.5 (pattern's rule)") {
    assert(Sentiment.score(Seq("not", "good")) === -0.35)
  }
  test("intensifier scales") {
    assert(Sentiment.score(Seq("very", "good")) === 0.91)
  }
  test("case-insensitive lookup") {
    assert(Sentiment.score(Seq("GOOD")) === 0.7)
  }
}

/** Loader check against the real reference model file (skipped if the
  * reference tree isn't mounted). */
class PatternsLoadSpec extends graft.SparkSpec {
  private val path = "/root/reference/NER_model/entity_ruler/patterns.jsonl"

  test("loadPatternsJsonl handles the full spaCy pattern file") {
    assume(new java.io.File(path).exists())
    val pats = EntityRuler.loadPatternsJsonl(spark, path)
    // 25,456 lines minus the 2 structural (Tag/Hashtag) patterns
    assert(pats.size > 25000)
    val m = new EntityRuler.Matcher(pats)
    // known patterns from the file: LOWER bigram with id, exact Brand
    assert(m.extract("add olive oil and Carrefour salt").toSeq
      .contains("Olive Oil"))
    assert(m.extract("Carrefour").toSeq === Seq("Carrefour"))
    // Brand patterns are case-sensitive (Text attr)
    assert(m.extract("I love carrefour").toSeq === Seq("empty"))
  }
}
