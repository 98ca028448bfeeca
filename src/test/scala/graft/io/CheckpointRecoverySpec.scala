package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Components

/** The DURABILITY claim behind Reliable/Staged (round-10, VERDICT r9
  * item 5): CheckpointStrategySpec pins result-identity, this spec
  * exercises failure and recovery itself.
  *
  *  - Staged: a computation KILLED mid-iteration leaves its last
  *    fully-written round on disk as plain parquet; a brand-new run
  *    resumes from that file (Components.initLabels, the production
  *    recovery hook) and converges to labels identical to an
  *    uninterrupted run.
  *  - EagerLocal (the contrast the Scaladoc claims): localCheckpoint
  *    blocks are non-replicated and sever lineage — destroying them
  *    (the single-JVM stand-in for executor loss) makes the frame
  *    UNRECOVERABLE, not silently recomputed.
  */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  // a 12-chain: needs several label rounds (pointer jumping engages
  // after round 2), so a mid-iteration crash is genuinely partial
  private lazy val pairs = (1L to 11L).map(i => (i, i + 1)).toDF("id1", "id2")
  private lazy val verts = (1L to 12L).map(Tuple1(_)).toDF("v")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  /** Delegates to Staged but kills the run (mid-iteration) right
    * after round `failAfter` has been FULLY staged — the moment an
    * executor-loss crash leaves a durable round behind. */
  private final class CrashAfter(inner: CheckpointStrategy, failAfter: Int)
      extends CheckpointStrategy {
    def session(tag: String): CheckpointStrategy.Mat = {
      val m = inner.session(tag)
      new CheckpointStrategy.Mat {
        private var steps = 0
        def pin(df: org.apache.spark.sql.DataFrame) = m.pin(df)
        def step(df: org.apache.spark.sql.DataFrame) = {
          val out = m.step(df) // round is durable on disk from here
          steps += 1
          if (steps > failAfter)
            throw new RuntimeException("simulated mid-iteration crash")
          out
        }
      }
    }
  }

  test("Staged: crash mid-iteration, resume from the staged round, identical labels") {
    val truth = rows(Components.connectedComponents(pairs, verts, "v",
      ckpt = CheckpointStrategy.Staged()))

    // crash after 2 staged label rounds (initial identity + round 1);
    // the full run needs more — assert the interruption was real
    val stageRoot = Scratch.tempDir("recovery_spec_")
    val crash = intercept[RuntimeException] {
      Components.connectedComponents(pairs, verts, "v",
        ckpt = new CrashAfter(CheckpointStrategy.Staged(Some(stageRoot)), 2))
    }
    assert(crash.getMessage.contains("simulated"))

    // the surviving state is ONLY what Staged left on disk: the
    // highest fully-written stepN parquet under the session dir
    val sessionDir = new java.io.File(stageRoot, "ckpt_components")
    val steps = Option(sessionDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("step"))
      .sortBy(f => f.getName.stripPrefix("step").toInt)
    assert(steps.nonEmpty, "crash left no staged round behind")
    val lastRound = steps.last.getAbsolutePath

    // a FRESH run resumes from the parquet bytes alone — no in-memory
    // state from the dead run is touched
    val resumed = spark.read.parquet(lastRound)
    assert(rows(resumed) != truth, "crash happened after convergence — " +
      "the resume below would prove nothing")
    val (out, roundsResumed) = Components.connectedComponentsWithRounds(
      pairs, verts, "v",
      ckpt = CheckpointStrategy.Staged(),
      initLabels = Some(resumed))
    assert(rows(out) == truth, "resumed run diverged from the uninterrupted one")
    assert(roundsResumed >= 1)
  }

  test("EagerLocal: destroyed localCheckpoint blocks are fatal, not recomputed") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = (1L to 1000L).toDF("x")
      .withColumn("y", col("x") * 2).localCheckpoint()
    assert(ck.count() === 1000L)
    // simulated executor loss: drop the checkpoint's storage blocks
    val newIds = sc.getPersistentRDDs.keySet -- before
    assert(newIds.nonEmpty, "localCheckpoint registered no persistent RDD")
    newIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
    val ex = intercept[Exception] { ck.count() }
    val msg = Option(ex.getMessage).getOrElse("") + " " +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("checkpoint") || msg.toLowerCase.contains("block"),
      s"expected a lost-checkpoint-block failure, got: $msg")
  }
}
