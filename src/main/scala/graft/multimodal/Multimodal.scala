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
      var v = 0
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"netpbm: unsupported maxval $maxval")
    require(i < payload.length && isWs(payload(i)),
      "netpbm: missing raster separator")
    i += 1 // spec: EXACTLY one whitespace byte, then the raster
    val channels = if (color) 3 else 1
    val n = w * h * channels
    require(n > 0 && payload.length - i >= n, "netpbm: truncated raster")
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
