package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a naive interval-OVERLAP join —
  * `a JOIN b ON a.lo <= b.hi AND b.lo <= a.hi` (no equi-key) — into the
  * cell-bucketed equi-join of [[graft.dist.Joins.intervalJoin]], entirely
  * in the logical plan. Catalyst plans the naive conjunction as a
  * broadcast nested-loop join (O(|a|·|b|)); after the rewrite both sides
  * explode to the cells their intervals cover and hash-join on the cell
  * id, with the original condition retained and a first-shared-cell
  * equality (`cell = floor(max(a.lo, b.lo)/w)`) deduplicating multi-cell
  * overlaps — each matching pair emits exactly once, no distinct needed.
  *
  * The interval sibling of [[RangeJoinRewrite]] (which handles
  * point-in-interval). Opt-in via
  * `SET spark.graft.intervalJoin.cellWidth=<w>`; width near the typical
  * interval length. Assumes well-formed intervals (lo <= hi per row) —
  * the same contract Joins.intervalJoin documents; a reversed interval
  * fails the cell `sequence` at runtime rather than silently changing
  * results. Skips joins that already carry an equi-conjunct, which also
  * makes the rewrite self-terminating. */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val cellWidthConf = "spark.graft.intervalJoin.cellWidth"

  private[plans] def cellOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  private[plans] def from(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private[plans] def le(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(x, y) => Some((x, y))
    case GreaterThanOrEqual(y, x) => Some((x, y))
    case _ => None
  }

  /** Find `L.lo <= R.hi` and `R.lo <= L.hi` conjuncts; returns
    * (loL, hiL, loR, hiR). Only matches when the pairing is UNAMBIGUOUS —
    * exactly one cross-side `<=` in each direction. With several candidates
    * (a 2D box-overlap join, or unrelated inequality conjuncts) an arbitrary
    * pick could pair bounds across dimensions, producing a synthetic
    * "interval" like [a.x_lo, a.y_hi] whose reversed rows make `Sequence`
    * throw at runtime on queries this rule was never meant to touch — so
    * THIS rule leaves those joins untouched. The 2-D box case (exactly two
    * `<=` each way) is handled by its sibling [[BoxJoinRewrite]], which
    * resolves the bound pairing by column-name affinity and refuses when
    * the pairing is ambiguous; the always-explicit manual operator is
    * [[graft.dist.Joins.boxJoin]] (`box_join_lineitem` is the declared
    * query, now exercised through the rule path). */
  private def matchOverlap(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    val les = conjuncts.flatMap(le(_).toSeq)
    val numeric = (e: Expression) => e.dataType.isInstanceOf[NumericType]
    val c1s = les.filter { case (x, y) => from(x, l) && from(y, r) }
    val c2s = les.filter { case (x, y) => from(x, r) && from(y, l) }
    (c1s, c2s) match {
      case (Seq((loL, hiR)), Seq((loR, hiL)))
          if Seq(loL, hiL, loR, hiR).forall(numeric) =>
        Some((loL, hiL, loR, hiR))
      case _ => None
    }
  }

  private[plans] def hasEquiKey(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
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
        else matchOverlap(conjuncts, left, right) match {
          case None => j
          case Some((loL, hiL, loR, hiR)) =>
            val tz = Some(SQLConf.get.sessionLocalTimeZone)
            def cells(lo: Expression, hi: Expression, name: String, side: LogicalPlan) = {
              val attr = AttributeReference(name, LongType, nullable = false)()
              val seq = Sequence(cellOf(lo, w), cellOf(hi, w), Some(Literal(1L)), tz)
              (attr, Generate(Explode(seq), Nil, outer = false, None, Seq(attr), side))
            }
            val (cellL, newL) = cells(loL, hiL, "__graft_icell_l", left)
            val (cellR, newR) = cells(loR, hiR, "__graft_icell_r", right)
            val firstCell = Floor(Divide(
              Greatest(Seq(Cast(loL, DoubleType), Cast(loR, DoubleType))), Literal(w)))
            val newCond = And(EqualTo(cellL, cellR),
              And(EqualTo(Cast(cellL, LongType), Cast(firstCell, LongType)), cond))
            Project(j.output, Join(newL, newR, Inner, Some(newCond), hint))
        }
    }
  }
}
