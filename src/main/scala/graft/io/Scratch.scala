package graft.io

/** Scratch-space selection for the single-JVM harness entrypoints
  * (Bench / Verify / OpBench / PlanAudit / Profile).
  *
  * Spark treats `spark.local.dir` as the fast-ephemeral tier — on a
  * real cluster the cluster manager points it at executor-local NVMe.
  * This container's only disk is a shared virtual block device whose
  * throughput varies round-to-round (measured 103 MB/s fsync this
  * round, with multi-second writeback stalls that landed on whichever
  * queries ran during them), while the host has 128 GiB of RAM of
  * which the datasets use a few GiB. So the harness routes ALL
  * ephemeral I/O — shuffle files, localCheckpoint spill, staged
  * fixtures, managed-table warehouse — at the RAM-backed tmpfs when
  * one is writable, exactly the "scratch goes on the fast local tier"
  * placement a cluster deployment makes. Durable outputs (Verify's
  * result parquet for the DuckDB oracle compare) keep their
  * caller-given paths untouched.
  *
  * Calling [[root]] also re-points `java.io.tmpdir`, so the staged
  * fixtures built via `Files.createTempDirectory` /
  * `sys.props("java.io.tmpdir")` land on the same tier without each
  * call site knowing about the policy.
  */
object Scratch {
  /** Preferred scratch root: a subdir of /dev/shm when writable,
    * else the JVM default tmpdir. Idempotent; first use re-points
    * java.io.tmpdir (entrypoints consult it before any temp file is
    * created). */
  lazy val root: String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft_scratch")
        d.mkdirs()
        d.getAbsolutePath
      } else sys.props("java.io.tmpdir")
    sys.props("java.io.tmpdir") = base
    base
  }

  /** Apply the scratch policy to a session builder: shuffle/spill
    * and the managed-table warehouse follow the scratch root. */
  def configure(
      b: org.apache.spark.sql.SparkSession.Builder
  ): org.apache.spark.sql.SparkSession.Builder =
    b.config("spark.local.dir", root)
      .config("spark.sql.warehouse.dir",
        new java.io.File(root, "warehouse").getAbsolutePath)
}
