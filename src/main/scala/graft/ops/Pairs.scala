package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** G1 (SURVEY.md §2.7): ordered 2-combinations of an array column —
  * the reference's `itertools.combinations(All_phrases, 2)`
  * (ref demo.py:352-361, 453-458), done natively with a double
  * `posexplode` and an index filter. Stays entirely in Catalyst:
  * both generators are codegen'd, no UDF/UDTF needed.
  *
  * Scale note: output is O(n²) in the per-row array length. The
  * reference's arrays are entity lists (≤ tens of elements), so the
  * blow-up is bounded per row and the generate happens before the
  * shuffle — each executor expands its own rows. For unbounded arrays
  * a `slice` cap belongs upstream.
  */
object Pairs {

  /** Append pair columns (t1, t2) for every i<j combination of
    * `arrayCol` (list order preserved, like itertools.combinations).
    * Rows with <2 elements produce no output rows. */
  def explodePairs(df: DataFrame, arrayCol: String,
                   t1: String = "t1", t2: String = "t2"): DataFrame =
    df.select(col("*"), posexplode(col(arrayCol)).as(Seq("__i", t1)))
      .select(col("*"), posexplode(col(arrayCol)).as(Seq("__j", t2)))
      .filter(col("__i") < col("__j"))
      .drop("__i", "__j", arrayCol)
}
