package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 diagnostic: qC1's gated component graph at a given SF —
  * how many label rounds does convergence actually need, and what
  * does the graph look like (nodes, edges, largest component)?
  * Usage: tools/run_main.sh graft.DiagC1 <sfDir> [maxIter]
  */
object DiagC1 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val maxIter = if (args.length > 1) args(1).toInt else 100
    val spark = graft.io.Scratch.configure(SparkSession.builder()
      .master("local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    val docs = graft.io.Sources.table(s, dir, "documents")
    val filtered = docs
      .withColumn("n_tok",
        size(graft.text.TextStats.tokens(col("text"))).cast("long"))
      .where(col("lang") === "en" && col("n_tok") >= 30)
    val exact = filtered
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"), min("n_tok").as("n_tok"),
        count(lit(1)).as("n_dups"))
      .drop("h")
      .localCheckpoint()
    val exactIds = exact.select("doc_id")
    val pairs = graft.queries.DedupSim.stagedLshPairs(s, dir)
      .join(exactIds.withColumnRenamed("doc_id", "id1"), Seq("id1"), "left_semi")
      .join(exactIds.withColumnRenamed("doc_id", "id2"), Seq("id2"), "left_semi")
      .select("id1", "id2")
      .localCheckpoint()
    println(s"[diagC1] gated nodes=${exact.count()} pairs=${pairs.count()}")
    val t0 = System.nanoTime()
    val (comp, rounds) = graft.dedup.Components
      .connectedComponentsWithRounds(pairs, exact.select("doc_id"), "doc_id",
        maxIter = maxIter)
    val byCluster = comp.groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_clusters"), max("n").as("max_comp"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[diagC1] rounds=$rounds clusters=${byCluster.getLong(0)} " +
      f"maxComp=${byCluster.getLong(1)} ${secs}%.1f s")
    spark.stop()
  }
}
