package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, ExprId, Expression, LessThan, LessThanOrEqual, Literal, NamedExpression, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: the window top-k idiom
  *
  * {{{ Filter(rn <= k, [Project,] Window(rn := row_number() OVER
  *     (PARTITION BY keys ORDER BY o), ...)) }}}
  *
  * becomes the same Window over [[GroupedTopKPlan]](keys, o, k) with
  * the rank bound dropped. Users keep writing the idiom every Spark
  * user writes; the plan they get shuffles `k · |keys|` rows instead
  * of the whole table (see [[GroupedTopKPlan]] docs for the scale
  * argument). Re-running row_number over the reduced input reproduces
  * the ranks 1..k exactly, and the bound becomes a tautology
  * (≤ k rows per key remain), so the Filter conjunct is dropped;
  * other conjuncts stay.
  *
  * Fires only when provably safe:
  *  - the Window computes EXACTLY the one row_number — any sibling
  *    window function would see fewer input rows after the rewrite;
  *  - the window has a non-empty ORDER BY and a non-empty PARTITION BY
  *    (a global top-k is already TakeOrderedAndProject territory);
  *  - the bound is a positive integer literal: `rn <= k`, `rn < k+1`,
  *    or `rn = 1` (argmax — the k=1 degenerate that dominates real
  *    workloads);
  *  - every expression the rewrite passes through (projection list,
  *    remaining conjuncts, partition/order keys) is deterministic.
  *
  * Same tie contract as the idiom itself: with a non-total ORDER BY,
  * which tied row gets rank k is plan-dependent — before AND after.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotent late-bind of rule + strategy onto an existing session
    * (extension-built sessions get both from [[graft.GraftExtensions]]). */
  def install(spark: SparkSession): Unit = {
    GroupedTopK.install(spark)
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(WindowTopKRewrite)) {
      spark.experimental.extraOptimizations = cur :+ WindowTopKRewrite
    }
  }

  /** rn-bound conjunct → k (None = not a usable bound). */
  private def boundOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn && v > Int.MinValue => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn && v == 1 => Some(1)
    case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn && v == 1 => Some(1)
    case _ => None
  }

  /** The single-row_number Window shape, or None. */
  private def asTopKWindow(w: Window): Option[(ExprId, Window)] = w match {
    case Window(Seq(a @ Alias(WindowExpression(RowNumber(), _), _)), ps, os, _, _)
        if ps.nonEmpty && os.nonEmpty &&
          ps.forall(_.deterministic) && os.forall(_.deterministic) =>
      Some((a.exprId, w))
    case _ => None
  }

  private def rewrite(
      cond: Expression,
      w: Window,
      rn: ExprId,
      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (bounds, rest) = conjuncts.partition(c => boundOf(c, rn).isDefined)
    if (bounds.size != 1 || rest.exists(!_.deterministic)) None
    else boundOf(bounds.head, rn).filter(_ >= 1).map { k =>
      // Spark's own InferWindowGroupLimit may already have inserted a
      // rank-limit prune below the Window; GroupedTopK subsumes it
      // (heap instead of per-partition sort), so strip it rather than
      // pruning twice.
      val innermost = w.child match {
        case WindowGroupLimit(ps, os, _, limit, grandchild)
            if ps == w.partitionSpec && os == w.orderSpec && limit >= k =>
          grandchild
        case other => other
      }
      val reduced = w.copy(child =
        GroupedTopKPlan(w.partitionSpec, w.orderSpec, k, innermost))
      val body = wrap(reduced)
      rest.reduceOption(And).map(Filter(_, body)).getOrElse(body)
    }
  }

  /** Projection that merely renames/forwards attributes and constants
    * can sit between the Filter and the Window without blocking the
    * rewrite (withColumn + filter produces exactly this shape). */
  private def passThrough(p: Seq[NamedExpression]): Boolean =
    p.forall(_.deterministic)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: Window) =>
      asTopKWindow(w).flatMap { case (rn, win) =>
        rewrite(cond, win, rn, identity)
      }.getOrElse(f)

    case f @ Filter(cond, p @ Project(projList, w: Window))
        if passThrough(projList) =>
      asTopKWindow(w).flatMap { case (rn, win) =>
        rewrite(cond, win, rn, reduced => p.copy(child = reduced))
      }.getOrElse(f)
  }
}
