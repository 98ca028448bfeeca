package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the fixture-staging memoizer Bench's stage_s split
  * rests on: one build per key per JVM, nested stages allowed,
  * stable dir tags. */
class StagingSpec extends AnyFunSuite {

  test("once() runs the build exactly once per key and caches its result") {
    var runs = 0
    val key = s"stagingspec:${System.nanoTime()}"
    val a = Staging.once(key) { runs += 1; "built" }
    val b = Staging.once(key) { runs += 1; "rebuilt" }
    assert(a === "built" && b === "built" && runs === 1)
  }

  test("builds may nest (a drain stages its source first)") {
    val t = System.nanoTime()
    val outer = Staging.once(s"outer:$t") {
      val inner = Staging.once(s"inner:$t") { "src" }
      s"drained-from-$inner"
    }
    assert(outer === "drained-from-src")
    assert(Staging.once(s"inner:$t") { "never" } === "src")
  }

  test("distinct keys stage independently (per scale factor)") {
    val t = System.nanoTime()
    assert(Staging.once(s"q:$t:/sf0.01") { "a" } === "a")
    assert(Staging.once(s"q:$t:/sf0.1") { "b" } === "b")
  }

  test("dirTag is deterministic, filesystem-safe, and dir-sensitive") {
    assert(Staging.dirTag("/root/testdata/sf0.1") ===
      Staging.dirTag("/root/testdata/sf0.1"))
    assert(Staging.dirTag("/root/testdata/sf0.1") !==
      Staging.dirTag("/root/testdata/sf0.01"))
    assert(Staging.dirTag("/any/path").matches("[0-9a-f]{12}"))
  }
}
