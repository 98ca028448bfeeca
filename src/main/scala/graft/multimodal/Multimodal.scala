package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): media payloads are
  * opaque `binary` columns with typed metadata; decode / feature
  * extraction runs as a batched per-partition map — the Scala
  * analogue of `mapInPandas` (iterator-of-batches, constant memory,
  * no per-row closure dispatch).
  *
  * The image decode is REAL: a pure-JVM netpbm parser
  * ([[decodeNetpbm]]) handling both P6 (PPM, RGB) and P5 (PGM,
  * grayscale) — magic, whitespace/`#`-comment header tokens, maxval
  * validation, raster-length check, and a full pixel walk for
  * channel statistics. The fixture ([[withNetpbmColumn]]) stages
  * genuinely encoded netpbm bytes (header + raster) so the decoder
  * exercises every branch. Only two knowingly-synthetic pieces
  * remain, each documented at its definition: the video FRAME count
  * ([[decodeStub]], still images have no frames — q61's fan-out
  * demo) and qC2's pHash content hash.
  */
object Multimodal {

  /** Metadata emitted per decoded media payload. */
  case class MediaMeta(doc_id: Long, width: Int, height: Int,
                       n_frames: Int, format: String)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decoder retained ONLY for the video-frame fan-out demo
    * (q61): still-image formats have no frame count, so n_frames is
    * deterministic pseudo-metadata from the payload length. Image
    * decode proper is the REAL [[decodeNetpbm]] below. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, String) = {
    val len = payload.length
    val width = (len % 64 + 1) * 8
    val height = (len % 48 + 1) * 8
    val frames = len % 30 + 1
    val fmt = if (len % 2 == 0) "png" else "jpeg"
    (width, height, frames, fmt)
  }

  /** Resize planning: scale (w, h) to fit a bounding box preserving
    * aspect ratio — pure integer arithmetic over the metadata (the
    * actual pixel resample lives behind the codec stub). */
  def resizeDims(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                 maxSide: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val longSide = greatest(w, h)
    // scale in per-mille, capped at 1000 (never upscale). Explicit
    // floor() everywhere: Spark's numeric cast truncates while
    // DuckDB's rounds, so a bare cast would diverge cross-engine.
    val scale = least(floor(lit(maxSide * 1000) / longSide), lit(1000.0))
    (floor(w * scale / 1000.0).cast("int"), floor(h * scale / 1000.0).cast("int"))
  }

  /** Attach a binary media column (here: the UTF-8 payload of `text`
    * stands in for image bytes) — the schema shape a real ingest
    * would produce. */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

  /** Decoded netpbm metadata + pixel statistics — what a real image
    * ingest keeps per payload. */
  case class NetpbmMeta(doc_id: Long, format: String, width: Int,
                        height: Int, maxval: Int, channels: Int,
                        n_bytes: Int, sum_px: Long, min_px: Int,
                        max_px: Int, first_px: Int, last_px: Int)

  /** Encode a REAL netpbm image from a document's text: even byte
    * lengths become P6 (RGB PPM), odd become P5 (grayscale PGM);
    * dimensions derive from the length (w = len%16+1, h = len%12+1,
    * so the header is data-dependent) and the raster is the text's
    * bytes cycled to fill w·h·channels — genuine content, and every
    * stat the decoder computes is independently derivable from the
    * text (which is how the DuckDB oracles mirror it). The header
    * carries a `#` comment line so the parser's comment handling is
    * exercised on every payload. */
  def encodeNetpbm(text: String): Array[Byte] = {
    val tb = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val len = tb.length
    require(len > 0, "encodeNetpbm: empty text")
    val w = len % 16 + 1
    val h = len % 12 + 1
    val color = len % 2 == 0
    val n = w * h * (if (color) 3 else 1)
    val header = (if (color) "P6" else "P5") +
      s"\n# graft synthetic raster\n$w $h\n255\n"
    val hb = header.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](hb.length + n)
    System.arraycopy(hb, 0, out, 0, hb.length)
    var i = 0
    while (i < n) { out(hb.length + i) = tb(i % len); i += 1 }
    out
  }

  /** REAL pure-JVM netpbm decoder: parses the P6/P5 magic, header
    * integers with whitespace and `#`-comment skipping, validates
    * maxval and raster length, then walks every raster byte for
    * sum/min/max/first/last statistics. Rejects malformed payloads
    * loudly — a corrupt header must not decode to garbage stats. */
  def decodeNetpbm(payload: Array[Byte]): (String, Int, Int, Int, Int, Int, Long, Int, Int, Int, Int) = {
    require(payload.length >= 2 && payload(0) == 'P',
      "netpbm: bad magic")
    val color = payload(1) match {
      case '6' => true
      case '5' => false
      case m => throw new IllegalArgumentException(s"netpbm: unsupported magic P${m.toChar}")
    }
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def nextInt(): Int = {
      var skipping = true
      while (skipping) {
        while (i < payload.length && isWs(payload(i))) i += 1
        if (i < payload.length && payload(i) == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
        } else skipping = false
      }
      require(i < payload.length && payload(i) >= '0' && payload(i) <= '9',
        "netpbm: expected header integer")
      // accumulate in Long with a bound: Int arithmetic would WRAP on
      // an adversarial 10+-digit header and sneak past the sanity
      // requires below (fail-loudly contract)
      var v = 0L
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1
        require(v <= Int.MaxValue, "netpbm: header integer overflow")
      }
      v.toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"netpbm: unsupported maxval $maxval")
    require(i < payload.length && isWs(payload(i)),
      "netpbm: missing raster separator")
    i += 1 // spec: EXACTLY one whitespace byte, then the raster
    val channels = if (color) 3 else 1
    // w·h·channels in Long: the Int product wraps at ~2^31 pixels and
    // a wrapped small n would ACCEPT a corrupt huge-dimension header
    val nL = w.toLong * h * channels
    require(nL > 0 && payload.length - i >= nL, "netpbm: truncated raster")
    val n = nL.toInt // bounded by payload length after the require
    var sum = 0L; var mn = 255; var mx = 0
    val first = payload(i) & 0xff
    val last = payload(i + n - 1) & 0xff
    var j = 0
    while (j < n) {
      val b = payload(i + j) & 0xff
      sum += b
      if (b < mn) mn = b
      if (b > mx) mx = b
      j += 1
    }
    (if (color) "ppm" else "pgm", w, h, maxval, channels, n, sum, mn, mx, first, last)
  }

  /** Fixture: stage really-encoded netpbm bytes per document (the
    * binary column a media ingest lands). */
  def withNetpbmColumn(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, encodeNetpbm(t)) }
      .toDF("doc_id", "media")
  }

  /** Batched REAL decode: mapPartitions over (id, payload) rows
    * through [[decodeNetpbm]] — same narrow constant-memory iterator
    * shape as [[decodeMeta]], but the codec is genuine. */
  def decodeNetpbmMeta(docsWithMedia: DataFrame): Dataset[NetpbmMeta] = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia.select(col("doc_id"), col("media"))
      .filter(col("doc_id").isNotNull && col("media").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val (fmt, w, h, maxval, c, n, sum, mn, mx, first, last) =
            decodeNetpbm(payload)
          NetpbmMeta(id, fmt, w, h, maxval, c, n, sum, mn, mx, first, last)
        }
      }
  }

  /** Decoded WAV metadata + sample statistics — what a real audio
    * ingest keeps per payload. All-integer (PCM16 samples), so the
    * oracle mirrors every field exactly. */
  case class WavMeta(doc_id: Long, channels: Int, sample_rate: Int,
                     n_samples: Int, sum_s: Long, min_s: Int,
                     max_s: Int, first_s: Int, last_s: Int,
                     energy: Long)

  /** Encode a REAL RIFF/WAVE PCM16 payload from a document's text:
    * channels (mono/stereo), sample rate, and frame count derive from
    * the text length, and each little-endian int16 sample is
    * `(byte − 128) · 256` over the text's bytes cycled — genuine
    * content, every statistic independently derivable from the text
    * (how the DuckDB oracle mirrors it). A junk `LIST` chunk sits
    * between `fmt ` and `data` so the decoder's unknown-chunk
    * skipping is exercised on every payload. */
  def encodeWav(text: String): Array[Byte] = {
    val tb = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val len = tb.length
    require(len > 0, "encodeWav: empty text")
    val channels = if (len % 2 == 0) 2 else 1
    val sampleRate = 8000 * (len % 3 + 1)
    val nFrames = len % 32 + 4
    val nSamples = nFrames * channels
    val dataSize = nSamples * 2
    val listBody = "INFOgrft".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val riffSize = 4 + (8 + 16) + (8 + listBody.length) + (8 + dataSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2)         // byte rate
      .putShort((channels * 2).toShort)          // block align
      .putShort(16.toShort)                      // bits per sample
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < nSamples) {
      buf.putShort((((tb(k % len) & 0xff) - 128) * 256).toShort)
      k += 1
    }
    buf.array()
  }

  /** REAL pure-JVM WAV decoder: validates the RIFF/WAVE container,
    * walks the chunk list (skipping unknown chunks, honoring the
    * odd-size pad byte), parses `fmt ` (PCM, 16-bit only, block-align
    * consistency), then walks every little-endian int16 sample in
    * `data` for sum/min/max/first/last and an exact integer energy
    * (Σ s²). Malformed payloads fail loudly. */
  def decodeWav(payload: Array[Byte]): (Int, Int, Int, Long, Int, Int, Int, Int, Long) = {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(payload.length >= 12 && fourCC() == "RIFF", "wav: bad RIFF magic")
    val riffSize = buf.getInt
    require(riffSize == payload.length - 8, "wav: RIFF size mismatch")
    require(fourCC() == "WAVE", "wav: not a WAVE container")
    var channels = -1; var sampleRate = -1
    var nSamples = -1
    var sum = 0L; var energy = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    var first = 0; var last = 0
    while (buf.remaining() >= 8) {
      val id = fourCC(); val size = buf.getInt
      require(size >= 0 && buf.remaining() >= size, s"wav: truncated chunk $id")
      id match {
        case "fmt " =>
          require(size == 16, "wav: non-PCM fmt chunk size")
          require(buf.getShort == 1, "wav: not PCM")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate (derived)
          val blockAlign = buf.getShort
          require(buf.getShort == 16, "wav: not 16-bit")
          require(blockAlign == channels * 2, "wav: block-align mismatch")
        case "data" =>
          require(channels > 0, "wav: data chunk before fmt")
          require(size % 2 == 0, "wav: odd PCM16 data size")
          // fail loudly on a second data chunk: silently continuing
          // would accumulate sums across chunks while nSamples kept
          // only the last chunk's count — garbage per-sample stats
          require(nSamples == -1, "wav: multiple data chunks")
          nSamples = size / 2
          require(nSamples > 0, "wav: empty data chunk")
          var k = 0
          while (k < nSamples) {
            val s: Int = buf.getShort
            if (k == 0) first = s
            last = s
            sum += s
            energy += s.toLong * s
            if (s < mn) mn = s
            if (s > mx) mx = s
            k += 1
          }
        case _ =>
          buf.position(buf.position() + size + (size & 1)) // skip + pad
      }
    }
    require(nSamples > 0, "wav: missing data chunk")
    (channels, sampleRate, nSamples, sum, mn, mx, first, last, energy)
  }

  /** Fixture: stage really-encoded WAV bytes per document (the binary
    * column an audio ingest lands). */
  def withWavColumn(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, encodeWav(t)) }
      .toDF("doc_id", "media")
  }

  /** Batched REAL audio decode: mapPartitions through [[decodeWav]] —
    * the same narrow constant-memory iterator shape as
    * [[decodeNetpbmMeta]]. */
  def decodeWavMeta(docsWithMedia: DataFrame): Dataset[WavMeta] = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia.select(col("doc_id"), col("media"))
      .filter(col("doc_id").isNotNull && col("media").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val (c, sr, n, sum, mn, mx, first, last, energy) = decodeWav(payload)
          WavMeta(id, c, sr, n, sum, mn, mx, first, last, energy)
        }
      }
  }

  /** Batched decode: mapPartitions over (id, payload) rows emitting
    * typed metadata. Narrow (partition-preserving), constant-memory
    * iterator — no collect, no shuffle. */
  def decodeMeta(docsWithMedia: DataFrame): Dataset[MediaMeta] = {
    val spark = docsWithMedia.sparkSession
    import spark.implicits._
    docsWithMedia.select(col("doc_id"), col("media"))
      // undecodable rows (null id/payload) are skipped, not fatal —
      // one bad record must not kill a 100 TB decode job
      .filter(col("doc_id").isNotNull && col("media").isNotNull)
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val (w, h, f, fmt) = decodeStub(payload)
          MediaMeta(id, w, h, f, fmt)
        }
      }
  }
}
