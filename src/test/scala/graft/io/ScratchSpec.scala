package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-tier policy the harness entrypoints rely on:
  * [[Scratch.root]] must resolve to a writable directory, must be
  * stable across calls (entrypoints and query staging read it at
  * different times), and must re-point java.io.tmpdir so
  * Files.createTempDirectory-based fixture staging lands on the same
  * tier without each call site knowing the policy. */
class ScratchSpec extends AnyFunSuite {

  test("root is a writable directory and prefers the RAM tier when present") {
    val root = new java.io.File(Scratch.root)
    assert(root.isDirectory && root.canWrite)
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      assert(Scratch.root.startsWith("/dev/shm/"))
  }

  test("root is stable, re-points the tmpdir prop, and tempDir lands on it") {
    val first = Scratch.root
    assert(Scratch.root == first)
    assert(sys.props("java.io.tmpdir") == first)
    // JDK 17 pins NIO's default temp factory to the BOOT-time tmpdir
    // (StaticProperty), so the policy is: staging goes through
    // Scratch.tempDir, which must land on the scratch root
    val d = Scratch.tempDir("scratch_spec")
    try assert(d.startsWith(first))
    finally java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(d))
  }

  test("configure points local.dir and warehouse at the scratch root") {
    // getOrCreate would reuse the suite-shared session and silently
    // ignore these (static) configs, so assert on the builder's own
    // option map instead of a live session
    val b = Scratch.configure(org.apache.spark.sql.SparkSession.builder())
    val optionsField = Iterator
      .iterate[Class[_]](b.getClass)(_.getSuperclass)
      .takeWhile(_ != null)
      .flatMap(_.getDeclaredFields)
      .find(_.getName.endsWith("options"))
      .get
    optionsField.setAccessible(true)
    val opts = optionsField.get(b)
      .asInstanceOf[scala.collection.Map[String, String]]
    assert(opts("spark.local.dir") == Scratch.root)
    assert(opts("spark.sql.warehouse.dir").startsWith(Scratch.root))
  }
}
