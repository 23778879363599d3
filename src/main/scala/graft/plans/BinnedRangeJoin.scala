package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType}

/**
 * Optimizer rule: rewrite a NON-EQUI inner join whose condition contains
 * a point-in-interval band — `p >= lo AND p <= hi` with `p` from one
 * side and `lo`/`hi` from the other — into the BINNED equi-join shape
 * ([[graft.ext.RangeJoin.pointInInterval]]'s plan, applied automatically
 * to any user-written `JOIN ... ON x BETWEEN lo AND hi`). Without it
 * Spark plans such joins as BroadcastNestedLoopJoin: |points|·|intervals|
 * comparisons. With it: intervals explode to the integer bins they span,
 * the point side computes its single bin, and the join becomes a hash
 * join on the bin with the ORIGINAL condition kept as the exact verify —
 * every true pair produced exactly once (a point's one bin meets each
 * containing interval's bin set once), so no dedup is needed and any
 * extra conjuncts ride along unchanged.
 *
 * OPT-IN: fires only when `spark.graft.rangeJoin.binWidth` is set — the
 * bin width is a data property (pick it near the typical interval
 * length) that a static rule cannot derive. Intervals spanning more than
 * `spark.graft.rangeJoin.maxBinsPerInterval` (default 1024) bins RAISE a
 * runtime error naming both knobs and the manual operator (which has a
 * broadcast wide path) — a silent million-element `sequence` per wide
 * interval would be the worse failure. NULL bounds are filtered on the
 * interval side (BETWEEN cannot match them) and a NULL point's bin is
 * NULL, which an equi-join never matches — exactly BETWEEN's semantics.
 *
 * Idempotent by construction: the rewritten join carries a cross-side
 * equi-conjunct on the bin columns, which disqualifies it from the
 * "non-equi" eligibility test.
 */
object BinnedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val widthKey = "spark.graft.rangeJoin.binWidth"
  private val capKey = "spark.graft.rangeJoin.maxBinsPerInterval"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(widthKey, "")
    if (width.isEmpty) return plan
    val w = width.toDouble
    require(w > 0.0 && !w.isInfinite && !w.isNaN, s"$widthKey must be > 0, got $width")
    val cap = conf.getConfString(capKey, "1024").toLong
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, w, cap).getOrElse(j)
    }
  }

  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, w: Double, cap: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(e: Expression): Boolean =
      e.references.intersect(left.outputSet).nonEmpty &&
        e.references.intersect(right.outputSet).nonEmpty
    // an existing cross-side equi-conjunct means Spark already hash-joins
    // (and marks our own rewrites, making the rule idempotent)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(EqualTo(a, b))
      case _ => false
    }
    if (hasEqui) return None
    def attrSide(a: Attribute): Int =
      if (left.outputSet.contains(a)) 0
      else if (right.outputSet.contains(a)) 1 else -1
    def numeric(a: Attribute): Boolean = a.dataType.isInstanceOf[NumericType]
    // an attr-vs-attr inequality is AMBIGUOUS in isolation — `x <= hi`
    // reads as "point x under upper bound hi" OR "lower bound x under
    // point hi" — so emit BOTH (point, bound, isLower) interpretations
    // per conjunct and let the PAIRING resolve it: only the reading
    // where one attribute takes a lower bound from one conjunct and an
    // upper bound from another (bounds on the opposite side) survives.
    def interps(e: Expression): Seq[(Attribute, Attribute, Boolean)] = e match {
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) =>
        Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference) =>
        Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }
    val bounds = conjuncts.flatMap(interps(_)).filter { case (p, b, _) =>
      numeric(p) && numeric(b) && attrSide(p) >= 0 && attrSide(b) >= 0 &&
        attrSide(p) != attrSide(b)
    }
    val pair = (for {
      (p1, lo, true) <- bounds
      (p2, hi, false) <- bounds
      if p1.semanticEquals(p2)
    } yield (p1, lo, hi)).headOption
    pair.map { case (p, lo, hi) =>
      val pointOnLeft = attrSide(p) == 0
      val (points, intervals) = if (pointOnLeft) (left, right) else (right, left)
      val pbin = Alias(bin(p, w), "_graft_pbin")()
      val pSide = Project(points.output :+ pbin, points)
      val binLo = bin(lo, w)
      val binHi = bin(hi, w)
      val span = Add(Subtract(binHi, binLo), Literal(1L))
      val msg = Literal(
        s"BinnedRangeJoin: an interval spans more than $cap bins at " +
          s"$widthKey=$w - raise $widthKey, raise $capKey, or call " +
          "graft.ext.RangeJoin.pointInInterval directly (it has a " +
          "broadcast wide-interval path).")
      // timeZoneId set explicitly: Sequence is TimeZoneAwareExpression
      // and post-analysis nobody runs ResolveTimeZone for us (unused
      // for integral sequences, but resolution demands it)
      val seq = If(LessThanOrEqual(span, Literal(cap)),
        new Sequence(binLo, binHi, Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone)),
        Cast(new RaiseError(msg), ArrayType(LongType, containsNull = false)))
      val ibin = AttributeReference("_graft_ibin", LongType, nullable = false)()
      val iSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ibin),
        child = Filter(And(IsNotNull(lo), IsNotNull(hi)), intervals))
      val joined = Join(
        if (pointOnLeft) pSide else iSide,
        if (pointOnLeft) iSide else pSide,
        Inner,
        Some(And(EqualTo(pbin.toAttribute, ibin), cond)), JoinHint.NONE)
      Project(j.output, joined)
    }
  }
}
