package graft
import org.apache.spark.sql.SparkSession
/** Print one query's formatted physical plan against a given SF dir —
  * the plan-inspection loop for scale work (PLANS.md pins sf0.01).
  * The QUERY is never executed; note that CONSTRUCTION of a few
  * queries runs a bounded metadata job (qB4's corpus count for the
  * corpus-relative df cap — one parquet-footer count per
  * construction), so a plan-only pass is cheap and deterministic but
  * not strictly zero-job. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.io.Scratch.configure(SparkSession.builder()
      .master("local[4]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"==== $name")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable =>
        println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
