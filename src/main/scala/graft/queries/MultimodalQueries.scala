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
    }),

    // Perceptual-hash near-duplicate detection over the media column
    // — the image-dedup analogue of q54's banded simhash. The 60-bit
    // "pHash" is the documented content-hash STUB (a real pipeline
    // swaps in a DCT pHash; everything downstream is the production
    // shape): pigeonhole banding into 4×15-bit keys guarantees zero
    // false negatives at Hamming radius 3 (4 bands, ≤3 flipped bits
    // ⇒ ≥1 band untouched), candidates come only from band-key
    // equality (never all-pairs), and the verify is one xor +
    // bit_count per CANDIDATE. Emits every candidate with its
    // distance + the radius verdict, so the verify logic itself is
    // hash-checked.
    "qC2_phash_media_dedup" -> ((s, dir) => {
      val docs = Multimodal.withMediaColumn(table(s, dir, "documents"))
      val h = docs.select(col("doc_id"),
        graft.dedup.Dedup.md5Long(col("media").cast("string")).as("ph"))
      val bands = h.select(col("doc_id"), col("ph"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bv", expr("shiftright(ph, band * 15) & 32767"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(h.select(col("doc_id").as("id1"), col("ph").as("ph1")), "id1")
        .join(h.select(col("doc_id").as("id2"), col("ph").as("ph2")), "id2")
        .select(col("id1"), col("id2"),
          expr("bit_count(ph1 ^ ph2)").as("hamming"))
        .withColumn("is_near", col("hamming") <= 3)
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
         FROM m GROUP BY format""",

    // same 60-bit md5 prefix, same 4x15-bit bands; xor + bit_count
    // verify per candidate
    "qC2_phash_media_dedup" ->
      """WITH h AS (
           SELECT doc_id,
             CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS ph
           FROM documents),
         b AS (
           SELECT doc_id, ph, g.i AS band,
             (ph >> (g.i * 15)) & 32767 AS bv
           FROM h, generate_series(0, 3) g(i)),
         cand AS (
           SELECT DISTINCT a.doc_id AS id1, b2.doc_id AS id2
           FROM b a JOIN b b2
             ON a.band = b2.band AND a.bv = b2.bv
            AND a.doc_id < b2.doc_id)
         SELECT id1, id2,
           CAST(bit_count(xor(h1.ph, h2.ph)) AS INTEGER) AS hamming,
           bit_count(xor(h1.ph, h2.ph)) <= 3 AS is_near
         FROM cand
         JOIN h h1 ON h1.doc_id = id1
         JOIN h h2 ON h2.doc_id = id2"""
  )
}
