package graft.dedup

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingDupPairs finds scaled duplicates, not orthogonal vectors") {
    // v2 = 0.5·v1 (same direction → cosine 1.0); v3 orthogonal
    val df = Seq(
      (1L, "b", Seq(1.0f, 2.0f, 0.0f, 0.0f)),
      (2L, "b", Seq(0.5f, 1.0f, 0.0f, 0.0f)),
      (3L, "b", Seq(0.0f, 0.0f, 3.0f, 0.0f)),
      (4L, "other", Seq(1.0f, 2.0f, 0.0f, 0.0f)) // same dir, different bucket
    ).toDF("vec_id", "bkt", "embedding")
    val pairs = Dedup.embeddingDupPairs(df, "vec_id", "embedding", "bkt", 0.95)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L))) // bucket isolation keeps 4 out
  }

  test("simhashNearPairs: identical token sets → hamming 0; disjoint sets are far") {
    val df = Seq(
      (1L, "b", Seq("alpha", "beta", "gamma", "delta")),
      (2L, "b", Seq("delta", "alpha", "gamma", "beta")), // same set, order differs
      (3L, "b", Seq("zz1", "zz2", "zz3", "zz4", "zz5", "zz6"))
    ).toDF("doc_id", "bkt", "toks")
    val fp = Dedup.simhash32(df, "doc_id", "toks")
      .join(df.select("doc_id", "bkt"), "doc_id")
    val near = Dedup.simhashNearPairs(fp, "doc_id", "simhash", "bkt", 3)
      .select("id1", "id2", "hamming").collect()
    assert(near.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    assert(near.head.getInt(2) === 0) // identical sets → identical fingerprint
  }
}
