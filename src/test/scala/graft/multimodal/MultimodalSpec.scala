package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The real netpbm codec contract: encode → decode round-trips the
  * header and raster statistics, the parser handles comments and
  * rejects malformed payloads, and a hand-built external payload
  * (not produced by our encoder) decodes correctly. */
class MultimodalSpec extends AnyFunSuite {

  test("encode/decode round-trip: P6 color from even-length text") {
    val t = "abcdefghij" // len 10, even → P6, w=11, h=11, n=363
    val (fmt, w, h, maxval, c, n, sum, mn, mx, first, last) =
      Multimodal.decodeNetpbm(Multimodal.encodeNetpbm(t))
    assert(fmt === "ppm" && w === 11 && h === 11 && maxval === 255)
    assert(c === 3 && n === 363)
    val tb = t.getBytes("US-ASCII").map(_ & 0xff)
    val expect = (0 until n).map(i => tb(i % 10))
    assert(sum === expect.map(_.toLong).sum)
    assert(mn === expect.min && mx === expect.max)
    assert(first === 'a'.toInt && last === expect.last)
  }

  test("encode/decode round-trip: P5 grayscale from odd-length text") {
    val t = "hello" // len 5, odd → P5, w=6, h=6, n=36
    val (fmt, w, h, _, c, n, sum, _, _, first, last) =
      Multimodal.decodeNetpbm(Multimodal.encodeNetpbm(t))
    assert(fmt === "pgm" && w === 6 && h === 6 && c === 1 && n === 36)
    val tb = t.getBytes("US-ASCII").map(_ & 0xff)
    assert(sum === (0 until 36).map(i => tb(i % 5).toLong).sum)
    assert(first === 'h'.toInt && last === tb(35 % 5))
  }

  test("decodes an externally-authored payload with comments and CRLF ws") {
    // 2x2 gray image, multiple comments, tabs/CR in the header —
    // not a byte layout our encoder ever emits
    val header = "P5\t# c1\n#c2 99\n\r2\n# between dims\n2 255 "
    val raster = Array[Byte](0, 127, -1, 64) // 0, 127, 255, 64
    val payload = header.getBytes("US-ASCII") ++ raster
    val (fmt, w, h, maxval, c, n, sum, mn, mx, first, last) =
      Multimodal.decodeNetpbm(payload)
    assert(fmt === "pgm" && w === 2 && h === 2 && maxval === 255)
    assert(c === 1 && n === 4 && sum === 446L)
    assert(mn === 0 && mx === 255 && first === 0 && last === 64)
  }

  test("rejects malformed payloads loudly") {
    val good = Multimodal.encodeNetpbm("abcd")
    intercept[IllegalArgumentException] { // bad magic
      Multimodal.decodeNetpbm("P4\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodeNetpbm(good.dropRight(1))
    }
    intercept[IllegalArgumentException] { // unsupported maxval
      Multimodal.decodeNetpbm("P5\n1 1\n65535\n".getBytes("US-ASCII") ++ Array[Byte](1, 1))
    }
    intercept[IllegalArgumentException] { // non-integer header token
      Multimodal.decodeNetpbm("P5\nx 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1))
    }
  }

  test("wav encode/decode round-trip: stereo from even-length text") {
    val t = "abcdefghij" // len 10, even → 2 ch, rate 8000·(10%3+1)=16000,
                         // frames 10%32+4=14, samples 28
    val (c, sr, n, sum, mn, mx, first, last, energy) =
      Multimodal.decodeWav(Multimodal.encodeWav(t))
    assert(c === 2 && sr === 16000 && n === 28)
    val tb = t.getBytes("US-ASCII")
    val expect = (0 until 28).map(k => ((tb(k % 10) & 0xff) - 128) * 256)
    assert(sum === expect.map(_.toLong).sum)
    assert(mn === expect.min && mx === expect.max)
    assert(first === expect.head && last === expect.last)
    assert(energy === expect.map(s => s.toLong * s).sum)
  }

  test("wav decode: mono, skips unknown chunks, validates container") {
    val t = "xyz" // len 3, odd → 1 ch, rate 8000, frames 7, samples 7
    val payload = Multimodal.encodeWav(t)
    val (c, sr, n, _, _, _, _, _, _) = Multimodal.decodeWav(payload)
    assert(c === 1 && sr === 8000 && n === 7)
    intercept[IllegalArgumentException] { // truncated
      Multimodal.decodeWav(payload.dropRight(1))
    }
    intercept[IllegalArgumentException] { // bad magic
      Multimodal.decodeWav("RIFX".getBytes("US-ASCII") ++ payload.drop(4))
    }
    // corrupt the fmt tag so no fmt chunk precedes data → loud reject
    val noFmt = payload.clone()
    val fmtAt = payload.indexOfSlice("fmt ".getBytes("US-ASCII"))
    noFmt(fmtAt) = 'z'.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWav(noFmt) }
  }
}
