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
  * The actual codec is a clearly-marked deterministic STUB (image/
  * audio libraries are not in this container); everything around it —
  * schema, binary handling, batch iteration, partition-preserving
  * execution — is the real Spark shape you'd keep when swapping in a
  * JNI/FFI decoder.
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

  /** STUB decoder: deterministic pseudo-metadata derived from payload
    * length — stands in for a real image/video header parse. The
    * (len % …) arithmetic is the documented fake; swap this single
    * function for a real codec. */
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

  /** Feature-extraction STUB: an 8-dim pseudo-embedding from content
    * hashes (stands in for a vision encoder; deterministic, so the
    * downstream similarity plumbing is fully testable). */
  def featureStub(payloadText: org.apache.spark.sql.Column, dims: Int = 8): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dims - 1)), j =>
      (conv(substring(md5(concat(payloadText, lit("_"), j)), 1, 15), 16, 10)
        .cast("long") % 1000) / 1000.0)

  /** Attach a binary media column (here: the UTF-8 payload of `text`
    * stands in for image bytes) — the schema shape a real ingest
    * would produce. */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.withColumn("media", col("text").cast("binary"))

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
