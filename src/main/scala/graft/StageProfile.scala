package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Headless stand-in for the Spark UI's stage table (optimization
  * guide §1/§7): run each named query once warm, then once measured
  * with a listener, and print per-stage task counts, task-time sums,
  * max/median task skew, and shuffle/input volumes. Diagnostic only —
  * never part of the bench or verify surfaces.
  */
object StageProfile {
  private case class StageRow(id: Int, name: String, var tasks: Int = 0,
    var runMs: Long = 0, var maxMs: Long = 0,
    var times: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty,
    var inputB: Long = 0, var srB: Long = 0, var swB: Long = 0,
    var wallMs: Long = 0, var cpuNs: Long = 0, var gcMs: Long = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.io.Scratch.configure(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // match Bench's JIT warm-up
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      SparkEntry.staging.get(n).foreach(_(spark, sfDir))
      // one warm pass so codegen/JIT don't pollute stage attribution
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"==== $n FAILED: ${e.getMessage}"); }
      val stages = mutable.LinkedHashMap.empty[Int, StageRow]
      val starts = mutable.Map.empty[Int, Long]
      val listener = new SparkListener {
        override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
          starts(s.stageInfo.stageId) = System.nanoTime()
          stages.getOrElseUpdate(s.stageInfo.stageId,
            StageRow(s.stageInfo.stageId,
              s.stageInfo.name.takeWhile(_ != '\n'))); ()
        }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          val r = stages.getOrElseUpdate(si.stageId,
            StageRow(si.stageId, si.name.takeWhile(_ != '\n')))
          r.wallMs = starts.get(si.stageId)
            .map(t0 => (System.nanoTime() - t0) / 1000000).getOrElse(-1)
        }
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val r = stages.getOrElseUpdate(t.stageId, StageRow(t.stageId, "?"))
          r.tasks += 1
          val m = t.taskMetrics
          if (m != null) {
            val ms = m.executorRunTime
            r.runMs += ms; r.times += ms
            if (ms > r.maxMs) r.maxMs = ms
            r.inputB += m.inputMetrics.bytesRead
            r.srB += m.shuffleReadMetrics.totalBytesRead
            r.swB += m.shuffleWriteMetrics.bytesWritten
            r.cpuNs += m.executorCpuTime
            r.gcMs += m.jvmGCTime
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val wall = (System.nanoTime() - t0) / 1e9
      // listenerBus is private[spark]; a short sleep drains the bus
      // for this diagnostic's purposes
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"==== $n  wall=${wall}%.2f s  (warm run)")
      println("  stage tasks  wall_ms  run_ms  cpu_ms   gc_ms   max_ms  med_ms    input   shufR   shufW  name")
      stages.values.toSeq.sortBy(-_.wallMs).foreach { r =>
        val med = if (r.times.isEmpty) 0L
          else r.times.sorted.apply(r.times.size / 2)
        def mb(b: Long) = f"${b / 1048576.0}%7.1f"
        println(f"  ${r.id}%5d ${r.tasks}%5d ${r.wallMs}%8d ${r.runMs}%7d ${r.cpuNs / 1000000}%7d ${r.gcMs}%7d ${r.maxMs}%8d ${med}%7d ${mb(r.inputB)} ${mb(r.srB)} ${mb(r.swB)}  ${r.name.take(60)}")
      }
    }
    spark.stop()
  }
}
