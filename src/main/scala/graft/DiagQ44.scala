package graft

import org.apache.spark.sql.SparkSession

/** A/B diagnostic for the q44 Jaccard verify join strategy (the
  * `graft.jaccard.broadcastVerifyBytes` knob): runs q44 against a
  * given SF dir alternating the broadcast (`b`) and shuffle (`s`)
  * verify paths in one JVM, printing rows + wall time per run.
  *
  * Round-10 measurements this tool produced (sf1, warm, separate
  * JVMs): hybrid broadcast 17.3/17.5 s stable; pure double-shuffle
  * 41-90 s unstable (the candidates×arrays shuffle spills) — the
  * evidence behind Dedup.jaccardPairs' hybrid verify default.
  *
  * Usage: tools/run_main.sh graft.DiagQ44 <sfDir> [b|s ...]
  */
object DiagQ44 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.io.Scratch.configure(SparkSession.builder()
      .master("local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("q44_jaccard_pairs")
    def run(tag: String, knob: String): Unit = {
      spark.conf.set("graft.jaccard.broadcastVerifyBytes", knob)
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[diag] $tag%-10s rows=$n%d  $s%.2f s")
    }
    // warm JIT once with the small default path
    args.drop(1).foreach {
      case "b" => run("broadcast", (1L << 30).toString)
      case "s" => run("shuffle", "0")
    }
    spark.stop()
  }
}
