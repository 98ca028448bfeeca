package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc profiling: run each named query twice, print cold/warm secs. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.io.Scratch.configure(SparkSession.builder()
      .master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def t(): Double = { val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime()-t0)/1e9 }
      val c = t(); val w = t()
      println(f"$n%-28s cold=$c%6.2f warm=$w%6.2f")
    }
    spark.stop()
  }
}
