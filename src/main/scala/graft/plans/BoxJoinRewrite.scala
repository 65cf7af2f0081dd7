package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a naive 2-D box-overlap join —
  * `a JOIN b ON a.xlo <= b.xhi AND b.xlo <= a.xhi
  *          AND a.ylo <= b.yhi AND b.ylo <= a.yhi` (no equi-key) —
  * into the grid-cell equi-join of [[graft.dist.Joins.boxJoin]], entirely
  * in the logical plan. Catalyst plans the 4-inequality conjunction as a
  * broadcast nested-loop join (O(|a|·|b|)); after the rewrite both sides
  * explode to the (x-cell, y-cell) grid cells their rectangles cover and
  * hash-join on the cell pair, with the original condition retained and a
  * first-shared-cell equality per axis deduplicating multi-cell overlaps —
  * each intersecting pair emits exactly once, no distinct needed.
  *
  * The 2-D sibling of [[IntervalJoinRewrite]] (which deliberately refuses
  * multi-conjunct joins). Opt-in via BOTH
  * `SET spark.graft.boxJoin.cellWidth.x=<wx>` and `...cellWidth.y=<wy>`;
  * widths near each axis's typical box extent. "x" is the dimension whose
  * left-to-right `<=` conjunct appears FIRST in the WHERE clause.
  *
  * **Bound pairing.** A WHERE clause gives two `L <= R` and two `R <= L`
  * conjuncts but does not say which pair forms which axis; mispairing
  * builds synthetic "intervals" like [a.xlo, a.yhi] that can be reversed
  * (crashing `Sequence`) or span wildly different scales. The rule pairs
  * by COLUMN-NAME AFFINITY: every bound must be a bare column, and the
  * pairing whose per-axis (lo, hi) names share the longer common
  * prefix/suffix (`x_lo`/`x_hi`, `lo_x`/`hi_x`, `zxlo`/`zxhi`, …) must WIN
  * STRICTLY over the crossed pairing — a tie (e.g. `start`/`stop` naming
  * with no shared stem) refuses the rewrite and leaves the join to
  * Catalyst, which is always semantically safe. The manual operator
  * [[graft.dist.Joins.boxJoin]] takes the dimensions explicitly and has no
  * such restriction.
  *
  * Assumes well-formed rectangles (lo <= hi per row per axis) — the same
  * contract `Joins.boxJoin` documents; a reversed bound fails the cell
  * `sequence` at runtime rather than silently changing results. Skips
  * joins that already carry an equi-conjunct, which also makes the rewrite
  * self-terminating. */
object BoxJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val cellWidthXConf = "spark.graft.boxJoin.cellWidth.x"
  val cellWidthYConf = "spark.graft.boxJoin.cellWidth.y"

  /** (loL, hiL, loR, hiR) of one axis. */
  private case class Dim(loL: Expression, hiL: Expression,
                         loR: Expression, hiR: Expression) {
    def bounds: Seq[Expression] = Seq(loL, hiL, loR, hiR)
  }

  private def nameOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Shared-stem length of two column names: max of common prefix and
    * common suffix, covering both `x_lo`/`x_hi` and `lo_x`/`hi_x` styles. */
  private def affinity(a: String, b: String): Int = {
    val p = a.lazyZip(b).takeWhile { case (x, y) => x == y }.size
    val s = a.reverse.lazyZip(b.reverse).takeWhile { case (x, y) => x == y }.size
    math.max(p, s)
  }

  private def score(d: Dim): Option[Int] =
    for {
      nLoL <- nameOf(d.loL); nHiL <- nameOf(d.hiL)
      nLoR <- nameOf(d.loR); nHiR <- nameOf(d.hiR)
    } yield affinity(nLoL, nHiL) + affinity(nLoR, nHiR)

  /** Find the two-axes overlap pattern; returns (dimX, dimY) with dimX =
    * the axis of the first left-to-right conjunct. Matches only when the
    * name-affinity pairing has a STRICT winner (see object scaladoc). */
  private def matchBox(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan)
      : Option[(Dim, Dim)] = {
    val les = conjuncts.flatMap(IntervalJoinRewrite.le(_).toSeq)
    val numeric = (e: Expression) => e.dataType.isInstanceOf[NumericType]
    val c1s = les.filter { case (x, y) =>
      IntervalJoinRewrite.from(x, l) && IntervalJoinRewrite.from(y, r) }
    val c2s = les.filter { case (x, y) =>
      IntervalJoinRewrite.from(x, r) && IntervalJoinRewrite.from(y, l) }
    if (c1s.size != 2 || c2s.size != 2) return None
    val Seq((lo1, hiR1), (lo2, hiR2)) = c1s // (loL, hiR) candidates
    val Seq((loR1, hiL1), (loR2, hiL2)) = c2s // (loR, hiL) candidates
    val straight = (Dim(lo1, hiL1, loR1, hiR1), Dim(lo2, hiL2, loR2, hiR2))
    val crossed = (Dim(lo1, hiL2, loR2, hiR1), Dim(lo2, hiL1, loR1, hiR2))
    val all8 = straight._1.bounds ++ straight._2.bounds
    // every bound numeric + a bare named column, and no column doing double
    // duty across axes — anything else is not the box-join shape
    if (!all8.forall(e => numeric(e) && nameOf(e).isDefined)) return None
    if (all8.distinct.size != 8) return None
    (for {
      sStraight <- score(straight._1); s2 <- score(straight._2)
      sCrossed <- score(crossed._1); c2 <- score(crossed._2)
    } yield (sStraight + s2, sCrossed + c2)).flatMap { case (st, cr) =>
      if (st > cr) Some(straight)
      else if (cr > st) Some(crossed)
      else None // ambiguous naming — refuse, Catalyst's plan is safe
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    val confX = SQLConf.get.getConfString(cellWidthXConf, "")
    val confY = SQLConf.get.getConfString(cellWidthYConf, "")
    if (confX.isEmpty || confY.isEmpty) return plan
    val wx = confX.toDouble
    val wy = confY.toDouble
    require(wx > 0 && wy > 0,
      s"$cellWidthXConf/$cellWidthYConf must be positive, got ($wx, $wy)")
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (IntervalJoinRewrite.hasEquiKey(conjuncts, left, right)) j
        else matchBox(conjuncts, left, right) match {
          case None => j
          case Some((dx, dy)) =>
            val tz = Some(SQLConf.get.sessionLocalTimeZone)
            // chain two Generates per side: rows explode to every grid
            // cell (x-cell, y-cell) their rectangle covers
            def cells(side: LogicalPlan, lox: Expression, hix: Expression,
                      loy: Expression, hiy: Expression, tag: String) = {
              val ax = AttributeReference(s"__graft_bcell_x$tag", LongType, nullable = false)()
              val ay = AttributeReference(s"__graft_bcell_y$tag", LongType, nullable = false)()
              val gx = Generate(Explode(Sequence(
                IntervalJoinRewrite.cellOf(lox, wx), IntervalJoinRewrite.cellOf(hix, wx),
                Some(Literal(1L)), tz)), Nil, outer = false, None, Seq(ax), side)
              val gy = Generate(Explode(Sequence(
                IntervalJoinRewrite.cellOf(loy, wy), IntervalJoinRewrite.cellOf(hiy, wy),
                Some(Literal(1L)), tz)), Nil, outer = false, None, Seq(ay), gx)
              (ax, ay, gy)
            }
            val (axL, ayL, newL) = cells(left, dx.loL, dx.hiL, dy.loL, dy.hiL, "l")
            val (axR, ayR, newR) = cells(right, dx.loR, dx.hiR, dy.loR, dy.hiR, "r")
            // first shared cell per axis: the cell of max(loL, loR) — the
            // one grid cell every intersecting pair necessarily shares
            def firstCell(d: Dim, w: Double): Expression = Floor(Divide(
              Greatest(Seq(Cast(d.loL, DoubleType), Cast(d.loR, DoubleType))), Literal(w)))
            val newCond =
              And(EqualTo(axL, axR), And(EqualTo(ayL, ayR),
                And(EqualTo(Cast(axL, LongType), Cast(firstCell(dx, wx), LongType)),
                  And(EqualTo(Cast(ayL, LongType), Cast(firstCell(dy, wy), LongType)), cond))))
            Project(j.output, Join(newL, newR, Inner, Some(newCond), hint))
        }
    }
  }
}
