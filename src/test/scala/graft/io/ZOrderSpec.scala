package graft.io

import graft.SparkSpec

/** Pins the property q88's layout argument rests on: interleaving is
  * the Morton curve, so every 2^k-aligned square of the (x, y) grid
  * shares one zval prefix — which is exactly why min/max stats on a
  * zval-range-partitioned file prune BOTH dimensions. (The interleave
  * arithmetic itself is oracle-checked bit-for-bit by q88.) */
class ZOrderSpec extends SparkSpec {

  private def morton(x: Long, y: Long): Long =
    (0 until 16).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.reduce(_ | _)

  test("2^k-aligned squares share the zval >> 2k prefix; distinct squares differ") {
    val k = 4 // 16x16 tiles
    for (tileX <- 0 until 4; tileY <- 0 until 4) {
      val prefixes = for (dx <- 0 until (1 << k); dy <- 0 until (1 << k))
        yield morton((tileX << k) + dx, (tileY << k) + dy) >> (2 * k)
      assert(prefixes.distinct.size === 1,
        s"tile ($tileX,$tileY) spans ${prefixes.distinct.size} prefixes")
      assert(prefixes.head === morton(tileX, tileY),
        "tile prefix must be the Morton code of the tile coordinates")
    }
  }

  test("curve is bijective on the 16-bit grid sample") {
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield morton(x, y)
    assert(pts.distinct.size === 64 * 64)
    // and stays within the interleaved bit budget
    assert(pts.max < (1L << 12))
  }
}
