package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch contract: exactness below k, merge-order invariance
  * (the 100 TB re-aggregation property), the closure of the pure-
  * Column union with the aggregate itself, and the 3-sigma accuracy
  * envelope of the distinct / Jaccard / intersection estimators. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val K = 256

  test("below k the sketch is the exact distinct hash set") {
    val df = (1 to 100).flatMap(i => Seq(i, i)).toDF("x") // every value twice
    val arr = df.agg(KmvSketch(xxhash64(col("x")), K).as("sk"))
      .select(size(col("sk")).as("n"),
        KmvSketch.estimate(col("sk"), K).as("est"))
      .head()
    assert(arr.getInt(0) === 100, "duplicates must not occupy sketch slots")
    assert(arr.getDouble(1) === 100.0, "below k the estimate is exact")
  }

  test("merge is order-invariant: partitioned aggregation equals single-partition") {
    val df = (1 to 60000).map(i => ((i % 7).toLong, (i * 2654435761L) % 40000))
      .toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      d.groupBy("g").agg(KmvSketch(xxhash64(col("x")), K).as("sk"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(run(df.coalesce(1)) === run(df.repartition(13, col("x"))),
      "k-smallest-of-union merge must be exact")
  }

  test("Column-level unionK equals the aggregate over the concatenated input") {
    val a = (1 to 5000).toDF("x")
    val b = (3000 to 9000).toDF("x")
    val skA = a.agg(KmvSketch(xxhash64(col("x")), K).as("sk")).head().getSeq[Long](0)
    val skB = b.agg(KmvSketch(xxhash64(col("x")), K).as("sk")).head().getSeq[Long](0)
    val direct = a.union(b).agg(KmvSketch(xxhash64(col("x")), K).as("sk"))
      .head().getSeq[Long](0)
    val viaColumns = Seq((skA, skB)).toDF("a", "b")
      .select(KmvSketch.unionK(col("a"), col("b"), K).as("u"))
      .head().getSeq[Long](0)
    assert(viaColumns === direct, "KMV union closure must hold exactly")
  }

  test("distinct, Jaccard, and intersection estimates land inside 3 sigma") {
    val n = 20000
    val overlap = 10000 // |A|=20k, |B|=20k, |A∩B|=10k, |A∪B|=30k
    val a = (1 to n).toDF("x")
    val b = ((n - overlap + 1) to (2 * n - overlap)).toDF("x")
    val skA = a.agg(KmvSketch(xxhash64(col("x")), K).as("a"))
    val skB = b.agg(KmvSketch(xxhash64(col("x")), K).as("b"))
    val row = skA.crossJoin(skB)
      .select(
        KmvSketch.estimate(col("a"), K).as("estA"),
        KmvSketch.estimate(KmvSketch.unionK(col("a"), col("b"), K), K).as("estU"),
        KmvSketch.jaccard(col("a"), col("b"), K).as("estJ"))
      .head()
    val rsd = 1.0 / math.sqrt(K - 2) // bottom-k estimator rsd
    assert(math.abs(row.getDouble(0) - n) <= 3 * rsd * n,
      s"distinct estimate ${row.getDouble(0)} off $n beyond 3 sigma")
    assert(math.abs(row.getDouble(1) - 3.0 * overlap) <= 3 * rsd * 3.0 * overlap,
      s"union estimate ${row.getDouble(1)} off ${3 * overlap} beyond 3 sigma")
    val j = overlap / (3.0 * overlap)
    val sigmaJ = math.sqrt(j * (1 - j) / K)
    assert(math.abs(row.getDouble(2) - j) <= 3 * sigmaJ + rsd,
      s"Jaccard estimate ${row.getDouble(2)} off $j beyond envelope")
  }
}
