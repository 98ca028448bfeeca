package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources.table
import graft.pipeline.TweetPipeline

/** The full reference pipeline run end-to-end through the driver
  * surface, over a tweet-shaped frame synthesized deterministically
  * from `documents`. Driver check is rows-only (the NER trie inside
  * isn't SQL-expressible); every component op is oracle-checked
  * individually (q20–q29) and the composition is pinned by
  * TweetPipelineSpec. */
object PipelineQueries {

  /** documents → (Timestamp, Text, Page_URL, Comments, Likes,
    * Retweets) with derived dates/keywords/engagement counts. */
  def tweetFrame(s: SparkSession, dir: String): DataFrame = {
    val kws = array(graft.ops.Cleanse.categoryTable.map(t => lit(t._1)): _*)
    table(s, dir, "documents")
      .withColumn("TweetDate",
        make_date(lit(2019), pmod(col("n_chars"), lit(12)) + 1,
          pmod(col("n_chars"), lit(27)) + 1))
      .select(
        date_format(col("TweetDate"), "MMM dd, yyyy").as("Timestamp"),
        col("text").as("Text"),
        concat(lit("https://twitter.com/search?q="),
          regexp_replace(element_at(kws, (pmod(col("doc_id"), lit(7)) + 1).cast("int")), " ", "%20"),
          lit("%20lang%3Aen%20until%3A2020-01-01")).as("Page_URL"),
        (pmod(col("n_chars"), lit(5))).cast("string").as("Comments"),
        concat(pmod(col("n_chars"), lit(9)).cast("string"), lit("K")).as("Likes"),
        pmod(col("n_chars"), lit(200)).cast("string").as("Retweets"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_tweet_pipeline_freq" -> ((s, dir) => {
      val m = new graft.text.EntityRuler.Matcher(TextQueries.demoPatterns)
      TweetPipeline.run(tweetFrame(s, dir), m, seed = 42L, sampleN = 500,
        months = (1 to 12).map(m => s"2019-$m")).freq1d
    }),
    "q71_tweet_pipeline_sent2d" -> ((s, dir) => {
      val m = new graft.text.EntityRuler.Matcher(TextQueries.demoPatterns)
      TweetPipeline.run(tweetFrame(s, dir), m, seed = 42L, sampleN = 500,
        months = (1 to 12).map(m => s"2019-$m")).sent2d
    })
  )

  def oracles: Map[String, String] = Map.empty
}
