package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a naive range join —
  * `points JOIN intervals ON p >= lo AND p <= hi` (no equi-key) — into the
  * cell-bucketed equi-join of [[graft.dist.Joins.rangeJoin]], entirely in
  * the logical plan. Catalyst plans the naive form as a broadcast
  * nested-loop / cartesian join (O(points × intervals)); after the rewrite
  * it is a hash join on a derived cell id with the exact range predicate
  * retained, so the user writes the obvious join and the engine makes it
  * scale.
  *
  * Opt-in via `SET spark.graft.rangeJoin.cellWidth=<width>` (the width is a
  * physical tuning choice the optimizer has no statistics for — near the
  * typical interval width is right; see Joins.rangeJoin). Registered with
  * the session through `GraftExtensions` (config-driven) or
  * `spark.experimental.extraOptimizations` (imperative).
  *
  * Semantics preserved exactly: the full original condition stays in the
  * rewritten join; a NULL point/bound produces a NULL cell (or an empty
  * cell sequence), which drops the row exactly as the NULL comparison did.
  * The rule skips joins that already have an equi-conjunct (hash-joinable
  * as written) — which also makes the rewrite self-terminating, since its
  * own output contains the cell equality. */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val cellWidthConf = "spark.graft.rangeJoin.cellWidth"

  private def cellOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  private def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** Find `p >= lo` / `p <= hi` with p from one side and both bounds from
    * the other; returns (p, lo, hi, pointsOnLeft). */
  private def matchRange(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    def lower(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case LessThanOrEqual(lo, p) => Some((p, lo))
      case _ => None
    }
    def upper(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(p, hi) => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case _ => None
    }
    val pairs = for {
      lc <- conjuncts; (p1, lo) <- lower(lc).toSeq
      uc <- conjuncts; (p2, hi) <- upper(uc).toSeq
      if p1.semanticEquals(p2) && p1.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
      ptsLeft <- (if (from(p1, l) && from(lo, r) && from(hi, r)) Some(true)
                  else if (from(p1, r) && from(lo, l) && from(hi, l)) Some(false)
                  else None).toSeq
    } yield (p1, lo, hi, ptsLeft)
    pairs.headOption
  }

  private def hasEquiKey(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) => (from(a, l) && from(b, r)) || (from(a, r) && from(b, l))
      case _ => false
    }

  def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = SQLConf.get.getConfString(cellWidthConf, "")
    if (conf.isEmpty) return plan
    val w = conf.toDouble
    require(w > 0, s"$cellWidthConf must be positive, got $w")
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasEquiKey(conjuncts, left, right)) j
        else matchRange(conjuncts, left, right) match {
          case None => j
          case Some((p, lo, hi, ptsLeft)) =>
            val (ptsSide, ivSide) = if (ptsLeft) (left, right) else (right, left)
            val cellAlias = Alias(cellOf(p, w), "__graft_cell_p")()
            val ptsP = Project(ptsSide.output :+ cellAlias, ptsSide)
            // Sequence is TimeZoneAwareExpression: a hand-built instance is
            // unresolved until the zone is pinned (the analyzer's
            // ResolveTimeZone already ran — we're in the optimizer)
            val seq = Sequence(cellOf(lo, w), cellOf(hi, w), Some(Literal(1L)),
              Some(SQLConf.get.sessionLocalTimeZone))
            val cellR = AttributeReference("__graft_cell_iv", LongType, nullable = false)()
            val ivG = Generate(Explode(seq), Nil, outer = false, None, Seq(cellR), ivSide)
            val (newL, newR) = if (ptsLeft) (ptsP, ivG) else (ivG, ptsP)
            val newCond = And(EqualTo(cellAlias.toAttribute, cellR), cond)
            Project(j.output, Join(newL, newR, Inner, Some(newCond), hint))
        }
    }
  }
}
