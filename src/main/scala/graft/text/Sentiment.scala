package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Lexicon sentiment scorer — TextBlob-like polarity (SURVEY.md §2.8:
  * ref demo.py:162-163 uses TextBlob's PatternAnalyzer). Contract
  * (range-compatible [-1,1], not bit-level TextBlob parity — the
  * reference inputs are missing so bit parity is untestable):
  *
  *  - lowercase token lookup in a polarity lexicon;
  *  - the token immediately before a hit modifies it: a negator
  *    multiplies by -0.5 (pattern's published negation rule), an
  *    intensifier scales it;
  *  - score = mean over matched tokens; no hits ⇒ 0.0.
  *
  * Polarities are kept in integer per-mille so aggregation is exact
  * integer arithmetic until one final division — the same trick the
  * oracle-checked queries use for bit-stable cross-engine compares.
  */
object Sentiment {

  /** Compact English polarity lexicon (per-mille), authored for this
    * engine from common-knowledge sentiment vocabulary. */
  val lexicon: Map[String, Int] = Map(
    "good" -> 700, "great" -> 800, "excellent" -> 1000, "amazing" -> 600,
    "awesome" -> 1000, "love" -> 500, "like" -> 200, "best" -> 1000,
    "nice" -> 600, "happy" -> 800, "fantastic" -> 400, "wonderful" -> 1000,
    "delicious" -> 1000, "fresh" -> 300, "tasty" -> 1000, "perfect" -> 1000,
    "fun" -> 300, "cool" -> 350, "sweet" -> 350, "favorite" -> 1000,
    "better" -> 500, "beautiful" -> 850, "win" -> 400, "right" -> 286,
    "bad" -> -700, "terrible" -> -1000, "awful" -> -1000, "worst" -> -1000,
    "hate" -> -800, "horrible" -> -1000, "gross" -> -600, "nasty" -> -800,
    "disgusting" -> -1000, "sad" -> -500, "angry" -> -500, "wrong" -> -500,
    "poor" -> -400, "disappointing" -> -600, "boring" -> -1000,
    "worse" -> -400, "sick" -> -700, "flat" -> -125, "stale" -> -500,
    "bitter" -> -300, "sour" -> -250, "expensive" -> -300, "cheap" -> -400,
    "slow" -> -300, "fast" -> 200, "dirty" -> -600, "clean" -> 300,
    "weird" -> -250, "fake" -> -500, "real" -> 200, "new" -> 136,
    "old" -> -100, "hot" -> 200, "cold" -> -100, "dry" -> -200,
    "smooth" -> 400, "rich" -> 400, "strong" -> 300, "weak" -> -300)

  /** Includes whole contraction tokens: the tokenizer keeps "don't"
    * as one token, so a bare "n't" entry would never match. */
  val negators: Set[String] =
    Set("not", "no", "never", "cannot", "neither", "nor", "hardly",
      "don't", "doesn't", "didn't", "can't", "won't", "isn't", "wasn't",
      "aren't", "weren't", "couldn't", "shouldn't", "wouldn't", "ain't")

  /** intensifier → per-mille multiplier (1000 = ×1). */
  val intensifiers: Map[String, Int] = Map(
    "very" -> 1300, "really" -> 1300, "extremely" -> 1500, "so" -> 1200,
    "too" -> 1200, "totally" -> 1300, "absolutely" -> 1500,
    "slightly" -> 700, "somewhat" -> 800, "barely" -> 600)

  /** Integer core: Σ adjusted per-mille² and hit count. Final score =
    * sumAdj / (n * 1e6). */
  def scoreParts(tokens: Seq[String]): (Long, Int) = {
    var sum = 0L
    var n = 0
    var i = 0
    // Locale.ROOT: default-locale lowercasing diverges from Spark's
    // lower()/DuckDB's lower() under e.g. a Turkish JVM locale
    val lower = tokens.map(t =>
      if (t == null) "" else t.toLowerCase(java.util.Locale.ROOT))
    while (i < lower.length) {
      lexicon.get(lower(i)).foreach { pol =>
        val mod =
          if (i > 0 && negators(lower(i - 1))) -500
          else if (i > 0) intensifiers.getOrElse(lower(i - 1), 1000)
          else 1000
        sum += pol.toLong * mod
        n += 1
      }
      i += 1
    }
    (sum, n)
  }

  def score(tokens: Seq[String]): Double = {
    val (sum, n) = scoreParts(tokens)
    if (n == 0) 0.0 else sum.toDouble / n / 1000000.0
  }

  def scoreText(text: String): Double =
    score(Tokenizer.tokenize(text).toSeq)

  /** Column form over WHITESPACE tokens — the variant whose contract
    * is SQL-expressible for the DuckDB oracles (q31/q39). Misses
    * punctuation-adjacent words by design; the pipeline uses
    * [[sentimentColumnTokenized]] instead. */
  def sentimentColumn(text: Column): Column = {
    val f = udf((s: String) =>
      if (s == null) 0.0 else score(s.split(" ").toSeq))
    f(text)
  }

  /** Column form over the real tokenizer (punctuation split off), so
    * "great!" still scores — the pipeline-facing variant. */
  def sentimentColumnTokenized(text: Column): Column = {
    val f = udf((s: String) => if (s == null) 0.0 else scoreText(s))
    f(text)
  }

  /** Pure-Column scorer over a token ARRAY column — zero UDFs, zero
    * joins: map-literal lexicon lookups + zip_with against the
    * shifted-by-one token array for the preceding-token modifier,
    * exactly the `list_zip(w, list_prepend('', w[:-1]))` shape the
    * DuckDB oracles use. try_element_at (not element_at): under
    * Spark 4 ANSI mode element_at THROWS on a missing map key,
    * while a non-lexicon token must simply score null. */
  def scoreTokensColumn(tokens: Column): Column = {
    import org.apache.spark.sql.functions._
    val polMap = typedLit(lexicon)
    val intMap = typedLit(intensifiers)
    val negArr = array(negators.toSeq.sorted.map(lit): _*)
    val low = transform(tokens, t => lower(t))
    val prev = TextStats.prevShift(low)
    val adj = zip_with(low, prev, (t, p) =>
      try_element_at(polMap, t).cast("long") *
        when(array_contains(negArr, p), lit(-500L))
          .otherwise(coalesce(try_element_at(intMap, p), lit(1000)).cast("long")))
    val hits = filter(adj, x => x.isNotNull)
    when(size(hits) === 0, lit(0.0))
      .otherwise((aggregate(hits, lit(0L), (acc, x) => acc + x).cast("double")
        / size(hits)) / lit(1000000.0))
  }

  /** [[sentimentColumnTokenized]]'s contract as a pure Column
    * expression: same regex tokenization (via regexp_extract_all, the
    * Column twin of Tokenizer.Tok), same integer per-mille scoring —
    * but no UDF node in the plan, so the enrich chain stays fully
    * native. Value-equal to the UDF form on any input (pinned by
    * SentimentSpec); the pipeline (q70/q71/q7F/q80 oracles) uses this. */
  def sentimentColumnNative(text: Column): Column = {
    import org.apache.spark.sql.functions._
    val tokRe = "@[A-Za-z0-9_]+|[A-Za-z0-9_]+(?:'[A-Za-z]+)?|[^A-Za-z0-9_\\s]"
    scoreTokensColumn(
      regexp_extract_all(coalesce(text, lit("")), lit(tokRe), lit(0)))
  }

  /** UDF-free scoring as a DataFrame transform: posexplode tokens,
    * broadcast-join the lexicon, lag() for the preceding-token
    * modifier, integer aggregation per id. Same contract/values as
    * [[sentimentColumn]] but fully inside Catalyst — the shape that
    * scales (narrow generate + broadcast join + one shuffle on id,
    * which the downstream per-doc aggregate needs anyway). */
  def scoreNative(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val lex = broadcast(lexicon.toSeq.toDF("word", "pol"))
    val negArr = array(negators.toSeq.sorted.map(lit): _*)
    val toks = df.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("tok", lower(col("tok")))
      .withColumn("prev", lag(col("tok"), 1, null)
        .over(Window.partitionBy(idCol).orderBy("pos")))
    val intLex = broadcast(intensifiers.toSeq.toDF("iword", "imult"))
    val scored = toks
      .join(lex, toks("tok") === lex("word"), "inner")
      .join(intLex, col("prev") === col("iword"), "left")
      .withColumn("mod",
        when(array_contains(negArr, col("prev")), lit(-500))
          .otherwise(coalesce(col("imult"), lit(1000))))
      .withColumn("adj", col("pol").cast("long") * col("mod"))
    val perDoc = scored.groupBy(idCol)
      .agg(sum("adj").as("s"), count(lit(1)).as("n"))
      .withColumn("sentiment", (col("s").cast("double") / col("n")) / 1000000.0)
      .select(col(idCol), col("sentiment"))
    // docs with zero lexicon hits score 0.0
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .na.fill(0.0, Seq("sentiment"))
  }
}
