package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SortedIntersectSize must equal size(array_intersect(...)) on every
  * ascending-sorted input — it replaces that spelling in the PPJoin
  * verify, where a divergence would silently change q44-family
  * results. Property-checked over seeded random sorted arrays
  * including duplicates (the builtin counts DISTINCT common values;
  * the merge's run-skipping must match) and the empty/disjoint/
  * identical edges. */
class SortedIntersectSizeSpec extends SparkSpec {
  import spark.implicits._

  test("equals size(array_intersect) on seeded sorted arrays incl. duplicates") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      def arr() = Seq.fill(rng.nextInt(80))(rng.nextInt(60).toLong)
        .sorted // duplicates likely: 60-value domain, up to 80 draws
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
      .withColumn("merge", SortedIntersectSize(col("a"), col("b")))
    val bad = df.filter(col("builtin") =!= col("merge")).count()
    assert(bad === 0L, "merge intersect diverged from array_intersect")
    // non-degenerate fixture: some overlaps must be non-zero
    assert(df.agg(sum("merge")).head().getLong(0) > 0L)
  }

  test("edges: empty, disjoint, identical, single") {
    val df = Seq(
      (1L, Seq.empty[Long], Seq(1L, 2L)),
      (2L, Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (3L, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (4L, Seq(7L), Seq(7L, 7L, 7L))
    ).toDF("id", "a", "b")
      .withColumn("merge", SortedIntersectSize(col("a"), col("b")))
      .orderBy("id").select("merge").as[Int].collect().toSeq
    assert(df === Seq(0, 0, 3, 1))
  }

  test("interpreted path agrees with codegen") {
    // eval() (interpreted) is exercised directly on the expression;
    // the DataFrame path above runs through whole-stage codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = new SortedIntersectSize(
      Literal.create(Seq(1L, 2L, 4L, 8L)),
      Literal.create(Seq(2L, 3L, 4L, 9L)))
    assert(e.eval(null) === 2)
  }
}
