package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupSim, EvalQueries, EventQueries, GraphQueries, IoQueries, MultimodalQueries, PipelineQueries, PlanQueries, Relational, Relational2, TextQueries, TrainingQueries, TweetOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-module maps; every entry in
  * [[queries]] that is ANSI-SQL-expressible has a DuckDB oracle in
  * [[oracleSql]] under the same key with identical column names.
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (Relational2.queries, Relational2.oracles),
      (TweetOps.queries, TweetOps.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (DedupSim.queries, DedupSim.oracles),
      (EventQueries.queries, EventQueries.oracles),
      (MultimodalQueries.queries, MultimodalQueries.oracles),
      (IoQueries.queries, IoQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
      (PlanQueries.queries, PlanQueries.oracles),
      (TrainingQueries.queries, TrainingQueries.oracles),
      (GraphQueries.queries, GraphQueries.oracles),
      (EvalQueries.queries, EvalQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the full reference pipeline (cleanse → NER → weighted
    * monthly frequency pivot) over a tweet-shaped frame. */
  def entry(spark: SparkSession): DataFrame =
    queries("q70_tweet_pipeline_freq")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)

  /** One-time fixture staging per query (layout writes, stream
    * drains), memoized per JVM by graft.io.Staging. Bench runs these
    * ahead of its per-query timer and reports them as stage_s;
    * queries remain self-contained for every other caller (first call
    * stages inline). */
  def staging: Map[String, (SparkSession, String) => Unit] =
    IoQueries.staging ++ EventQueries.staging ++ DedupSim.staging ++
      GraphQueries.staging
}
