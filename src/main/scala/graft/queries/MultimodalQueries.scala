package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources.table
import graft.multimodal.Multimodal

/** Multimodal plumbing exercised end-to-end: binary column → batched
  * stub decode → typed metadata → aggregation. Oracle-checked because
  * the stub's metadata is pure arithmetic over the payload length
  * (== len(text): the corpus is ASCII). */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Frame sampling: every 5th frame of each decoded media payload
    // (the video→frames fan-out shape: a narrow generate, one row per
    // sampled frame, bounded per input row).
    "q61_frame_sample" -> ((s, dir) => {
      val docs = Multimodal.withMediaColumn(table(s, dir, "documents"))
      Multimodal.decodeMeta(docs).toDF()
        .withColumn("frame_idx",
          explode(sequence(lit(0), col("n_frames") - 1, lit(5))))
        .select(col("doc_id"), col("frame_idx"),
          (col("width") * col("height")).as("pixels"))
    }),

    // Resize planning over decoded metadata (aspect-preserving fit
    // into 256px, integer per-mille arithmetic — never upscales).
    "q62_media_resize" -> ((s, dir) => {
      val docs = Multimodal.withMediaColumn(table(s, dir, "documents"))
      val meta = Multimodal.decodeMeta(docs).toDF()
      val (rw, rh) = Multimodal.resizeDims(col("width"), col("height"), 256)
      meta.select(col("doc_id"), col("width"), col("height"),
        rw.as("rw"), rh.as("rh"))
    }),

    // Feature-extraction stub: 8-dim pseudo-embedding per payload,
    // flattened to (doc_id, dim, value) rows for the oracle compare.
    "q63_media_features" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Multimodal.featureStub(col("text"), 8)).as(Seq("dim", "feat")))
    }),

    "q60_media_meta" -> ((s, dir) => {
      val docs = Multimodal.withMediaColumn(table(s, dir, "documents"))
      Multimodal.decodeMeta(docs).toDF()
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
          sum("width").as("sum_w"), sum("height").as("sum_h"),
          max("n_frames").cast("long").as("max_frames"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q62_media_resize" ->
      """WITH m AS (
           SELECT doc_id,
             CAST((strlen(text) % 64 + 1) * 8 AS INTEGER) AS width,
             CAST((strlen(text) % 48 + 1) * 8 AS INTEGER) AS height
           FROM documents),
         s AS (
           SELECT doc_id, width, height,
             least(floor(256000 / greatest(width, height)), 1000.0) AS scale
           FROM m)
         SELECT doc_id, width, height,
           CAST(floor(width * scale / 1000.0) AS INT) AS rw,
           CAST(floor(height * scale / 1000.0) AS INT) AS rh
         FROM s""",

    "q63_media_features" ->
      """SELECT doc_id, CAST(g.j AS INTEGER) AS dim,
           (CAST(('0x' || substr(md5(text || '_' || g.j), 1, 15)) AS BIGINT) % 1000) / 1000.0 AS feat
         FROM documents, generate_series(0, 7) g(j)""",

    "q61_frame_sample" ->
      """WITH m AS (
           SELECT doc_id,
             (strlen(text) % 64 + 1) * 8 AS width,
             (strlen(text) % 48 + 1) * 8 AS height,
             strlen(text) % 30 + 1 AS n_frames
           FROM documents)
         SELECT doc_id, CAST(g.f AS INTEGER) AS frame_idx, CAST(width * height AS INTEGER) AS pixels
         FROM m, generate_series(0, 29, 5) g(f)
         WHERE g.f <= n_frames - 1""",

    "q60_media_meta" ->
      """WITH m AS (
           SELECT doc_id,
             (strlen(text) % 64 + 1) * 8 AS width,
             (strlen(text) % 48 + 1) * 8 AS height,
             strlen(text) % 30 + 1 AS n_frames,
             CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
           FROM documents)
         SELECT format, count(*) AS n,
           CAST(sum(width) AS BIGINT) AS sum_w, CAST(sum(height) AS BIGINT) AS sum_h,
           CAST(max(n_frames) AS BIGINT) AS max_frames
         FROM m GROUP BY format"""
  )
}
