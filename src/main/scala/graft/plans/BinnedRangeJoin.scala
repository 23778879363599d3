package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, JoinHint, LogicalPlan, Project}
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
 * Recognized bound shapes (each side of each inequality may be a bare
 * column or a monotone numeric cast of one — `CAST(x AS DOUBLE)` or any
 * lossless up-cast, the implicit-coercion shapes):
 *  - closed:    `p >= lo` / `p <= hi`
 *  - strict:    `p > lo`  / `p < hi`   (half-open intervals — the
 *    SCD2/timestamp-validity convention `ts >= valid_from AND
 *    ts < valid_to`; binning is unchanged because bins only
 *    over-approximate and the strict comparison stays in the verify)
 *  - NULL-open: `hi IS NULL OR p < hi` (and the `lo` mirror) — the
 *    open-ended "current version" convention. An open bound's bin is
 *    COALESCEd to the point side's own min/max bin (one slim global
 *    aggregate over the point subtree, cross-joined as a 1-row
 *    broadcast), so an open interval spans only the bins where points
 *    actually exist — bounded by the DATA, not by infinity.
 *
 * OPT-IN: fires only when `spark.graft.rangeJoin.binWidth` is set — the
 * bin width is a data property (pick it near the typical interval
 * length) that a static rule cannot derive. Intervals spanning more than
 * `spark.graft.rangeJoin.maxBinsPerInterval` (default 1024) bins RAISE a
 * runtime error naming both knobs and the manual operator (which has a
 * broadcast wide path) — a silent million-element `sequence` per wide
 * interval would be the worse failure. NULL bounds are filtered on the
 * interval side when the bound is CLOSED (BETWEEN cannot match them) and
 * kept when it is NULL-open; a NULL point's bin is NULL, which an
 * equi-join never matches — exactly BETWEEN's semantics.
 *
 * Idempotent by construction: the rewritten join carries a cross-side
 * equi-conjunct on the bin columns, which disqualifies it from the
 * "non-equi" eligibility test (and the injected 1-row point-stats cross
 * join has no condition at all, so the Some(cond) guard skips it).
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

  /** A bare column, or a numeric cast of one that preserves bin order:
   * any cast TO double is literally the value [[bin]] computes, and a
   * lossless up-cast is order-isomorphic — either way `bin(raw)` equals
   * `bin(cast)`, so binning the raw column over-approximates the cast
   * comparison and the kept original condition stays the exact verify. */
  private object BinnableAttr {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference => Some(a)
      case Cast(a: AttributeReference, DoubleType, _, _) => Some(a)
      case Cast(a: AttributeReference, t: NumericType, _, _)
          if Cast.canUpCast(a.dataType, t) => Some(a)
      case _ => None
    }
  }

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
    // point hi" — so emit BOTH (point, bound, isLower, isOpen)
    // interpretations per conjunct and let the PAIRING resolve it: only
    // the reading where one attribute takes a lower bound from one
    // conjunct and an upper bound from another (bounds on the opposite
    // side) survives. Strict bounds reuse the closed readings — the bin
    // range only over-approximates, the strictness lives in the verify.
    // The `b IS NULL OR cmp` disjunct keeps only readings where the
    // null-checked attr IS the bound (a NULL-open POINT would have to
    // match every interval, which a NULL bin never does — that reading
    // is unsound and is discarded).
    def interps(e: Expression): Seq[(Attribute, Attribute, Boolean, Boolean)] = e match {
      case GreaterThanOrEqual(BinnableAttr(a), BinnableAttr(b)) =>
        Seq((a, b, true, false), (b, a, false, false))
      case GreaterThan(BinnableAttr(a), BinnableAttr(b)) =>
        Seq((a, b, true, false), (b, a, false, false))
      case LessThanOrEqual(BinnableAttr(a), BinnableAttr(b)) =>
        Seq((a, b, false, false), (b, a, true, false))
      case LessThan(BinnableAttr(a), BinnableAttr(b)) =>
        Seq((a, b, false, false), (b, a, true, false))
      case Or(IsNull(BinnableAttr(nb)), cmp) =>
        interps(cmp).collect {
          case (p, b, isLower, false) if b.semanticEquals(nb) => (p, b, isLower, true)
        }
      case Or(cmp, IsNull(BinnableAttr(nb))) =>
        interps(cmp).collect {
          case (p, b, isLower, false) if b.semanticEquals(nb) => (p, b, isLower, true)
        }
      case _ => Seq.empty
    }
    val bounds = conjuncts.flatMap(interps(_)).filter { case (p, b, _, _) =>
      numeric(p) && numeric(b) && attrSide(p) >= 0 && attrSide(b) >= 0 &&
        attrSide(p) != attrSide(b)
    }
    val pair = (for {
      (p1, lo, true, loOpen) <- bounds
      (p2, hi, false, hiOpen) <- bounds
      if p1.semanticEquals(p2)
    } yield (p1, lo, hi, loOpen, hiOpen)).headOption
    val pointRewrite = pair.map { case (p, lo, hi, loOpen, hiOpen) =>
      val pointOnLeft = attrSide(p) == 0
      val (points, intervals) = if (pointOnLeft) (left, right) else (right, left)
      val pbin = Alias(bin(p, w), "_graft_pbin")()
      val pSide = Project(points.output :+ pbin, points)
      // a NULL-open bound spans "to the edge of the data": COALESCE its
      // bin with the point side's own min/max bin, computed once by a
      // 1-row global aggregate over the (already-pruned) point subtree
      // and cross-joined in — the planner broadcasts the single row, so
      // the cost is one extra slim pass over the point column, never a
      // nested loop
      val anyOpen = loOpen || hiOpen
      val mn = Alias(Min(bin(p, w)).toAggregateExpression(), "_graft_minpbin")()
      val mx = Alias(Max(bin(p, w)).toAggregateExpression(), "_graft_maxpbin")()
      val ivBase: LogicalPlan =
        if (!anyOpen) intervals
        else Join(intervals, Aggregate(Nil, Seq(mn, mx), points),
          Cross, None, JoinHint.NONE)
      val binLo =
        if (loOpen) Coalesce(Seq(bin(lo, w), mn.toAttribute))
        else bin(lo, w)
      val binHi0 =
        if (hiOpen) Coalesce(Seq(bin(hi, w), mx.toAttribute))
        else bin(hi, w)
      // with an open bound the coalesced edge can land BELOW the other
      // bound (an open-ended interval starting after the last point is
      // legal and must match nothing, not crash `sequence`); clamp to a
      // 1-bin range the equi-join then finds empty
      val binHi = if (anyOpen) Greatest(Seq(binHi0, binLo)) else binHi0
      val span = Add(Subtract(binHi, binLo), Literal(1L))
      val msg = Literal(
        s"BinnedRangeJoin: an interval spans more than $cap bins at " +
          s"$widthKey=$w - raise $widthKey, raise $capKey, or call " +
          "graft.ext.RangeJoin.pointInInterval directly (it has a " +
          "broadcast wide-interval path).")
      // timeZoneId set explicitly: Sequence is TimeZoneAwareExpression
      // and post-analysis nobody runs ResolveTimeZone for us (unused
      // for integral sequences, but resolution demands it).
      // A NULL span (open bound over an EMPTY point table makes the
      // coalesced edge NULL) must take the Sequence branch, not the
      // cap-RaiseError one (If treats a NULL predicate as false):
      // Sequence with NULL bounds yields NULL and Explode(outer=false)
      // drops the row — exactly the no-match the nested loop emits.
      val seq = If(Or(IsNull(span), LessThanOrEqual(span, Literal(cap))),
        new Sequence(binLo, binHi, Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone)),
        Cast(new RaiseError(msg), ArrayType(LongType, containsNull = false)))
      val ibin = AttributeReference("_graft_ibin", LongType, nullable = false)()
      val notNulls =
        (if (loOpen) Nil else Seq(IsNotNull(lo))) ++
          (if (hiOpen) Nil else Seq(IsNotNull(hi)))
      val ivFiltered =
        if (notNulls.isEmpty) ivBase
        else Filter(notNulls.reduce(And), ivBase)
      val iSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ibin),
        child = ivFiltered)
      val joined = Join(
        if (pointOnLeft) pSide else iSide,
        if (pointOnLeft) iSide else pSide,
        Inner,
        Some(And(EqualTo(pbin.toAttribute, ibin), cond)), JoinHint.NONE)
      Project(j.output, joined)
    }
    pointRewrite.orElse(
      rewriteOverlap(j, left, right, cond, conjuncts, attrSide, numeric, w, cap))
  }

  /**
   * The INTERVAL-OVERLAP fallback (tried only when the point-in-interval
   * pairing found nothing): `aLo <= bHi AND bLo <= aHi` with `aLo`/`aHi`
   * on one side and `bLo`/`bHi` on the other — the session/SCD-overlap
   * join Spark also plans as BroadcastNestedLoopJoin. Both sides explode
   * to the bins their interval spans and the join fires ONLY in
   * `bin == max(bin(aLo), bin(bLo))` — the later start lies inside both
   * intervals whenever they truly overlap and `bin` is monotone, so
   * every true pair matches exactly once (each side's `sequence` emits a
   * bin value at most once). The ORIGINAL condition rides along as the
   * exact verify, which also covers the deliberate slack in the bin
   * ranges:
   *  - spans use `least`/`greatest` of the two endpoints, so INVERTED
   *    rows (lo > hi — legal under the raw conjuncts when the other
   *    interval straddles them) still explode to a covering range
   *    instead of crashing `sequence`;
   *  - Least/Greatest SKIP nulls, so a row with one NULL endpoint
   *    explodes on the other alone — over-approximate but sound, the
   *    NULL comparison in the verify rejects it (matching the nested
   *    loop's semantics exactly).
   * Strict (`<`) conjuncts reuse the same bins — strictness lives in
   * the verify. Same opt-in knob, same per-interval bin cap with the
   * loud RaiseError, same idempotency (the rewrite introduces a
   * cross-side equi-conjunct).
   */
  private def rewriteOverlap(j: Join, left: LogicalPlan, right: LogicalPlan,
                             cond: Expression, conjuncts: Seq[Expression],
                             attrSide: Attribute => Int,
                             numeric: Attribute => Boolean,
                             w: Double, cap: Long): Option[LogicalPlan] = {
    // normalize every cross-side inequality to (x, y) meaning x <= y /
    // x < y (bins only over-approximate; strictness stays in the verify)
    val ineqs = conjuncts.flatMap {
      case LessThanOrEqual(BinnableAttr(x), BinnableAttr(y)) => Seq((x, y))
      case LessThan(BinnableAttr(x), BinnableAttr(y)) => Seq((x, y))
      case GreaterThanOrEqual(BinnableAttr(x), BinnableAttr(y)) => Seq((y, x))
      case GreaterThan(BinnableAttr(x), BinnableAttr(y)) => Seq((y, x))
      case _ => Nil
    }.filter { case (x, y) =>
      numeric(x) && numeric(y) && attrSide(x) >= 0 && attrSide(y) >= 0 &&
        attrSide(x) != attrSide(y)
    }
    val picked = (for {
      (x1, y1) <- ineqs // aLo <= bHi
      (x2, y2) <- ineqs // bLo <= aHi
      if attrSide(x1) == 0 && attrSide(x2) == 1
    } yield (x1, y2, x2, y1)).headOption
    picked.map { case (aLo, aHi, bLo, bHi) =>
      val msg = Literal(
        s"BinnedRangeJoin: an interval spans more than $cap bins at " +
          s"$widthKey=$w - raise $widthKey, raise $capKey, or call " +
          "graft.ext.RangeJoin.intervalOverlapJoin directly (it has a " +
          "broadcast wide-interval path).")
      def explodedSide(lo: Attribute, hi: Attribute, child: LogicalPlan,
                       binName: String): (AttributeReference, LogicalPlan) = {
        // least/greatest of the BINS, not the raw endpoints: the rule
        // runs post-analysis so no implicit coercion would reconcile
        // mixed numeric endpoint types, and bin is monotone so the two
        // formulations are equal
        val binLo = Least(Seq(bin(lo, w), bin(hi, w)))
        val binHi = Greatest(Seq(bin(lo, w), bin(hi, w)))
        val span = Add(Subtract(binHi, binLo), Literal(1L))
        // NULL span (BOTH endpoints NULL — Least/Greatest skip single
        // NULLs) takes the Sequence branch: Sequence over NULL bounds
        // yields NULL and Explode(outer=false) drops the row, matching
        // the nested loop's no-match exactly. Without the IsNull arm
        // the If's false-on-NULL semantics routed such rows into the
        // bin-cap RaiseError whenever constraint propagation did not
        // happen to push IsNotNull filters below the Generate.
        val seq = If(Or(IsNull(span), LessThanOrEqual(span, Literal(cap))),
          new Sequence(binLo, binHi, Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone)),
          Cast(new RaiseError(msg), ArrayType(LongType, containsNull = false)))
        val out = AttributeReference(binName, LongType, nullable = false)()
        (out, Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(out),
          child = child))
      }
      val (abin, aSide) = explodedSide(aLo, aHi, left, "_graft_abin")
      val (bbin, bSide) = explodedSide(bLo, bHi, right, "_graft_bbin")
      val laterStart = EqualTo(abin,
        Greatest(Seq(bin(aLo, w), bin(bLo, w))))
      val joined = Join(aSide, bSide, Inner,
        Some(And(And(EqualTo(abin, bbin), laterStart), cond)), JoinHint.NONE)
      Project(j.output, joined)
    }
  }
}
