package graft.text

import scala.util.matching.Regex

/** Regex tokenizer approximating spaCy's English rules for the NER
  * matcher (SURVEY.md §2.8; ref NER_model/tokenizer): punctuation is
  * split off word edges, `@word` mentions stay whole, `#` is its own
  * token (so a hashtag is the token pair `#`,`word` — exactly the
  * shape the reference's Hashtag pattern `[{ORTH:"#"},{IS_ASCII:true}]`
  * expects), simple apostrophe contractions stay attached.
  *
  * Exact spaCy-tokenizer parity is a non-goal (the reference's golden
  * outputs are irreproducible anyway, SURVEY.md §5); the matcher
  * contract is what's tested.
  */
object Tokenizer {

  private val Tok: Regex =
    "@[A-Za-z0-9_]+|[A-Za-z0-9_]+(?:'[A-Za-z]+)?|[^A-Za-z0-9_\\s]".r

  def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else Tok.findAllIn(text).toArray
}
