package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, LongType, NumericType}

import graft.core.GeoOps
import graft.functions.{GeoChordXyz, StDistance, StDistanceSpherical, StEnvelopeBounds, StPoint, StRelation, StRelationXY}

/**
 * Optimizer rule: rewrite an inner join whose condition contains a
 * DE-9IM predicate — `st_intersects(a.geom, b.geom)`,
 * `st_contains(a.geom, st_point(b.x, b.y))`, or any other of the
 * reference's eight modes with arguments from opposite sides — into
 * the GRID-CELL equi-join shape of [[graft.core.SpatialJoin]], applied
 * automatically to user-written spatial joins. Without it Spark plans
 * every such join as BroadcastNestedLoopJoin: |A|·|B| full topology
 * checks. With it: each geometry explodes to the grid cells its
 * envelope covers, a point side computes its single cell, the join
 * becomes a HASH join on the cell keys, and the ORIGINAL condition
 * rides along as the exact verify — plus a closed-envelope
 * double-compare prefilter ahead of the JTS matrix.
 *
 * Exactly-once is structural, matching the manual operator:
 *  - point × geometry: the point's one cell meets each covering
 *    geometry's cell set once;
 *  - geometry × geometry: the pair fires only in the REFERENCE cell
 *    `(max of the two x-range lows, max of the two y-range lows)` —
 *    covered by both ranges whenever they overlap at all, and unique.
 *
 * Nested-loop semantics are preserved exactly where the data is
 * degenerate, because nothing here REFUSES (unlike the manual
 * operator, whose loud-refusal contract a silent rule must not adopt):
 * a NULL geometry's envelope is NULL, its bins are NULL, `Sequence`
 * over NULL bounds yields NULL and `Explode(outer=false)` drops the
 * row — the nested loop's no-match. A NULL point coordinate's cell is
 * NULL, which an equi-join never matches — same. An EMPTY geometry
 * (JTS null envelope, minX > maxX) explodes to the Least/Greatest-
 * normalized 2-cell range and every candidate dies in the verify.
 * `st_disjoint` is NOT rewritten (its pairs are nearly the cross
 * product; grid candidates only form where envelopes overlap).
 *
 * DISTANCE predicates rewrite too: a conjunct
 * `st_distance(a, b) <= r` (or `< r`, literal on either side; `a`/`b`
 * each a geometry column or `st_point(x, y)` from one side) becomes
 * the EXPANDED-ENVELOPE cell equi-join — the left side explodes to the
 * cells covering its envelope, the right side to the cells covering
 * its envelope GROWN by `r` on every edge, so any true pair shares a
 * cell for ANY `cellSize` (each axis gap between the envelopes is at
 * most the distance ≤ r, so the grown intervals intersect); the
 * reference-cell trick gives exactly-once, an envelope-GAP prefilter
 * (`gx² + gy² <= r²` on the per-axis interval gaps) kills candidates
 * before the exact JTS distance in the retained original condition.
 * Pick `cellSize` near `r` — smaller cells multiply the grown
 * envelope's explode fan-out into the same loud cap. The OPPOSITE
 * inequality (`st_distance > r`, a near-cross-product) is NOT
 * rewritten, like `st_disjoint`. One loud exception to the
 * no-refusal stance above: an EMPTY geometry in a distance join
 * RAISES (JTS `distance(EMPTY, g) = 0` matches every row — a cross
 * product the grid cannot reproduce, and silently dropping those
 * pairs would be a wrong answer, the worse option).
 *
 * OPT-IN: the planar rewrites fire only when
 * `spark.graft.spatialJoin.cellSize` is set — the cell size is a data
 * property (pick it near the median geometry extent); the GEODESIC
 * distance rewrite (see [[rewriteGeo]]) fires under its own
 * `spark.graft.spatialJoin.geodesic = true` flag and needs NO size
 * knob (the chord bound fixes it). A geometry covering more than
 * `spark.graft.spatialJoin.maxCellsPerGeom` (default 4096) cells
 * RAISES a runtime error naming both knobs and the manual operator —
 * a silent million-cell explode per continent-sized geometry would be
 * the worse failure. Idempotent: the rewrite introduces cross-side
 * equi-conjuncts on the cell columns, which disqualify the join from
 * the non-equi eligibility test.
 */
object GridSpatialJoin extends Rule[LogicalPlan] with PredicateHelper {

  private val sizeKey = "spark.graft.spatialJoin.cellSize"
  private val capKey = "spark.graft.spatialJoin.maxCellsPerGeom"
  private val geoKey = "spark.graft.spatialJoin.geodesic"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val size = conf.getConfString(sizeKey, "")
    val geo = conf.getConfString(geoKey, "false").toBoolean
    if (size.isEmpty && !geo) return plan
    val cs = if (size.isEmpty) 0.0 else size.toDouble
    require(size.isEmpty || (cs > 0.0 && !cs.isInfinite && !cs.isNaN),
      s"$sizeKey must be > 0, got $size")
    val cap = conf.getConfString(capKey, "4096").toLong
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        (if (size.nonEmpty) rewrite(j, left, right, cond, cs, cap) else None)
          .orElse(if (geo) rewriteGeo(j, left, right, cond) else None)
          .getOrElse(j)
    }
  }

  /** A bare geometry (binary) column. */
  private object GeomAttr {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if a.dataType == BinaryType => Some(a)
      case _ => None
    }
  }

  /** A numeric coordinate column, bare or under the implicit-coercion
    * cast to double `st_point` inserts. */
  private object CoordAttr {
    def unapply(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if a.dataType.isInstanceOf[NumericType] => Some(a)
      case Cast(a: AttributeReference, DoubleType, _, _)
          if a.dataType.isInstanceOf[NumericType] => Some(a)
      case _ => None
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, cs: Double, cap: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(e: Expression): Boolean =
      e.references.intersect(left.outputSet).nonEmpty &&
        e.references.intersect(right.outputSet).nonEmpty
    // an existing cross-side equi-conjunct means Spark already hash-joins
    // (and marks our own rewrites, making the rule idempotent)
    val hasEqui = conjuncts.exists {
      case eq @ EqualTo(_, _) => crossSide(eq)
      case _ => false
    }
    if (hasEqui) return None
    def side(a: Attribute): Int =
      if (left.outputSet.contains(a)) 0
      else if (right.outputSet.contains(a)) 1 else -1
    def rewritable(mode: String): Boolean =
      GeoOps.modeId(mode) != GeoOps.DISJOINT
    // the first rewritable spatial conjunct wins; the others (and every
    // non-spatial conjunct) ride in the kept original condition
    val hit: Option[Either[(Attribute, Attribute, Attribute), (Attribute, Attribute)]] =
      conjuncts.iterator.map {
        case StRelation(m, GeomAttr(g), StPoint(CoordAttr(x), CoordAttr(y)))
            if rewritable(m) => pointCase(g, x, y, side)
        case StRelation(m, StPoint(CoordAttr(x), CoordAttr(y)), GeomAttr(g))
            if rewritable(m) => pointCase(g, x, y, side)
        case StRelationXY(m, GeomAttr(g), CoordAttr(x), CoordAttr(y))
            if rewritable(m) => pointCase(g, x, y, side)
        case StRelation(m, GeomAttr(a), GeomAttr(b))
            if rewritable(m) && side(a) >= 0 && side(b) >= 0 &&
              side(a) != side(b) =>
          Some(scala.util.Right(if (side(a) == 0) (a, b) else (b, a)))
        case _ => None
      }.collectFirst { case Some(h) => h }
    hit.map {
      case scala.util.Left((g, x, y)) =>
        rewritePoint(j, left, right, cond, g, x, y, side(g), cs, cap)
      case scala.util.Right((ga, gb)) =>
        rewriteGeomGeom(j, left, right, cond, ga, gb, cs, cap)
    }.orElse {
      // distance conjunct: st_distance(a, b) <= r (either literal
      // order, <= or <). The opposite inequality stays a nested loop.
      def sideOf(e: Expression): Int = {
        val refs = e.references
        if (refs.nonEmpty && refs.subsetOf(left.outputSet)) 0
        else if (refs.nonEmpty && refs.subsetOf(right.outputSet)) 1
        else -1
      }
      def distCase(ea: Expression, eb: Expression, r: Double)
          : Option[(Expression, Expression, Double)] =
        if (r > 0 && !r.isInfinite && !r.isNaN &&
            sideOf(ea) >= 0 && sideOf(eb) >= 0 && sideOf(ea) != sideOf(eb))
          Some(if (sideOf(ea) == 0) (ea, eb, r) else (eb, ea, r))
        else None
      conjuncts.iterator.map {
        case LessThanOrEqual(StDistance(GeomExpr(a), GeomExpr(b)), DoubleLit(r)) =>
          distCase(a, b, r)
        case LessThan(StDistance(GeomExpr(a), GeomExpr(b)), DoubleLit(r)) =>
          distCase(a, b, r)
        case GreaterThanOrEqual(DoubleLit(r), StDistance(GeomExpr(a), GeomExpr(b))) =>
          distCase(a, b, r)
        case GreaterThan(DoubleLit(r), StDistance(GeomExpr(a), GeomExpr(b))) =>
          distCase(a, b, r)
        case _ => None
      }.collectFirst { case Some(h) => h }
        .map { case (la, rb, r) =>
          rewriteDistance(j, left, right, cond, la, rb, r, cs, cap) }
    }
  }

  /** A geometry-producing expression the rule can envelope: a bare
    * binary column or a coordinate-built `st_point`. */
  private object GeomExpr {
    def unapply(e: Expression): Option[Expression] = e match {
      case GeomAttr(a) => Some(a)
      case p @ StPoint(CoordAttr(_), CoordAttr(_)) => Some(p)
      case _ => None
    }
  }

  /** A foldable numeric radius literal, bare or under a numeric cast. */
  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v, _: NumericType) if v != null => Some(v.toString.toDouble)
      case Cast(Literal(v, _: NumericType), DoubleType, _, _) if v != null =>
        Some(v.toString.toDouble)
      case _ => None
    }
  }

  private def pointCase(g: Attribute, x: Attribute, y: Attribute,
                        side: Attribute => Int)
      : Option[Either[(Attribute, Attribute, Attribute), (Attribute, Attribute)]] =
    if (side(g) >= 0 && side(x) >= 0 && side(x) == side(y) && side(g) != side(x))
      Some(scala.util.Left((g, x, y)))
    else None

  private def binW(e: Expression, cs: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(cs)))

  /** Explode `child` to the cells covered by `env`'s [x0,y0,x1,y1] on
    * one axis pair, with the cell-count cap riding the FIRST sequence
    * (a NULL product takes the Sequence branch — NULL bounds yield a
    * NULL sequence and the Generate drops the row, the nested loop's
    * no-match for a NULL geometry). Least/Greatest normalization keeps
    * `Sequence(step=1)` legal for EMPTY geometries' inverted null
    * envelope. */
  private def explodeCells(child: LogicalPlan, env: Attribute,
                           cxName: String, cyName: String,
                           cs: Double, cap: Long)
      : (Attribute, Attribute, Expression, Expression, LogicalPlan) = {
    def item(i: Int) = GetArrayItem(env, Literal(i))
    explodeRange(child, item(0), item(1), item(2), item(3),
      cxName, cyName, cs, cap)
  }

  /** [[explodeCells]] over explicit corner expressions — the distance
    * rewrite feeds the r-grown envelope through here. */
  private def explodeRange(child: LogicalPlan,
                           x0: Expression, y0: Expression,
                           x1: Expression, y1: Expression,
                           cxName: String, cyName: String,
                           cs: Double, cap: Long)
      : (Attribute, Attribute, Expression, Expression, LogicalPlan) = {
    val binLoX = Least(Seq(binW(x0, cs), binW(x1, cs)))
    val binHiX = Greatest(Seq(binW(x0, cs), binW(x1, cs)))
    val binLoY = Least(Seq(binW(y0, cs), binW(y1, cs)))
    val binHiY = Greatest(Seq(binW(y0, cs), binW(y1, cs)))
    val prod = Multiply(Add(Subtract(binHiX, binLoX), Literal(1L)),
      Add(Subtract(binHiY, binLoY), Literal(1L)))
    val msg = Literal(
      s"GridSpatialJoin: a geometry covers more than $cap cells at " +
        s"$sizeKey=$cs - raise $sizeKey, raise $capKey, or call " +
        "graft.core.SpatialJoin directly.")
    val seqX = If(Or(IsNull(prod), LessThanOrEqual(prod, Literal(cap))),
      new Sequence(binLoX, binHiX, Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone)),
      Cast(new RaiseError(msg), ArrayType(LongType, containsNull = false)))
    val seqY = new Sequence(binLoY, binHiY, Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone))
    val cx = AttributeReference(cxName, LongType, nullable = false)()
    val cy = AttributeReference(cyName, LongType, nullable = false)()
    val genX = Generate(Explode(seqX), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(cx), child = child)
    val genY = Generate(Explode(seqY), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(cy), child = genX)
    (cx, cy, binLoX, binLoY, genY)
  }

  private def rewritePoint(j: Join, left: LogicalPlan, right: LogicalPlan,
                           cond: Expression, g: Attribute,
                           x: Attribute, y: Attribute, geomSide: Int,
                           cs: Double, cap: Long): LogicalPlan = {
    val (gPlan, pPlan) = if (geomSide == 0) (left, right) else (right, left)
    val env = Alias(StEnvelopeBounds(g), "_graft_genv")()
    val gProj = Project(gPlan.output :+ env, gPlan)
    val (gcx, gcy, _, _, gSide) =
      explodeCells(gProj, env.toAttribute, "_graft_gcx", "_graft_gcy", cs, cap)
    val pcx = Alias(binW(x, cs), "_graft_pcx")()
    val pcy = Alias(binW(y, cs), "_graft_pcy")()
    val pSide = Project(pPlan.output ++ Seq(pcx, pcy), pPlan)
    def item(i: Int) = GetArrayItem(env.toAttribute, Literal(i))
    // closed-envelope prefilter: every rewritable mode implies the
    // point meets the geometry's closure, hence its envelope
    val pre = And(
      And(GreaterThanOrEqual(Cast(x, DoubleType), item(0)),
        LessThanOrEqual(Cast(x, DoubleType), item(2))),
      And(GreaterThanOrEqual(Cast(y, DoubleType), item(1)),
        LessThanOrEqual(Cast(y, DoubleType), item(3))))
    val joinCond = And(And(EqualTo(pcx.toAttribute, gcx),
      EqualTo(pcy.toAttribute, gcy)), And(pre, cond))
    val joined = Join(
      if (geomSide == 0) gSide else pSide,
      if (geomSide == 0) pSide else gSide,
      Inner, Some(joinCond), JoinHint.NONE)
    Project(j.output, joined)
  }

  private def rewriteGeomGeom(j: Join, left: LogicalPlan, right: LogicalPlan,
                              cond: Expression, ga: Attribute, gb: Attribute,
                              cs: Double, cap: Long): LogicalPlan = {
    val aEnv = Alias(StEnvelopeBounds(ga), "_graft_aenv")()
    val bEnv = Alias(StEnvelopeBounds(gb), "_graft_benv")()
    val aProj = Project(left.output :+ aEnv, left)
    val bProj = Project(right.output :+ bEnv, right)
    val (acx, acy, aLoX, aLoY, aSide) =
      explodeCells(aProj, aEnv.toAttribute, "_graft_acx", "_graft_acy", cs, cap)
    val (bcx, bcy, bLoX, bLoY, bSide) =
      explodeCells(bProj, bEnv.toAttribute, "_graft_bcx", "_graft_bcy", cs, cap)
    def aItem(i: Int) = GetArrayItem(aEnv.toAttribute, Literal(i))
    def bItem(i: Int) = GetArrayItem(bEnv.toAttribute, Literal(i))
    // reference cell: exactly-once without a dedup pass
    val refCell = And(
      EqualTo(acx, Greatest(Seq(aLoX, bLoX))),
      EqualTo(acy, Greatest(Seq(aLoY, bLoY))))
    // closed-envelope overlap prefilter ahead of the JTS matrix
    val pre = And(
      And(LessThanOrEqual(aItem(0), bItem(2)),
        LessThanOrEqual(bItem(0), aItem(2))),
      And(LessThanOrEqual(aItem(1), bItem(3)),
        LessThanOrEqual(bItem(1), aItem(3))))
    val joinCond = And(And(EqualTo(acx, bcx), EqualTo(acy, bcy)),
      And(refCell, And(pre, cond)))
    val joined = Join(aSide, bSide, Inner, Some(joinCond), JoinHint.NONE)
    Project(j.output, joined)
  }

  /** `st_distance(la, rb) <= r`: the left side explodes to its
    * envelope's cells, the right side to its envelope GROWN by r, the
    * pair fires once in the reference cell, and an envelope-gap
    * prefilter runs ahead of the exact distance in `cond`. NULL
    * geometry → NULL envelope → NULL bins → Generate drops the row —
    * the nested loop's no-match (its `st_distance` is NULL there too).
    * EMPTY geometries REFUSE loudly: JTS defines
    * `distance(EMPTY, g) = 0`, so the nested loop matches an empty row
    * against EVERY opposite row — a cross product no candidate grid
    * can reproduce; silently dropping those pairs would be a wrong
    * answer, so the rewrite raises instead (filter empties upstream,
    * or unset the cellSize conf for the literal nested-loop
    * semantics). */
  private def rewriteDistance(j: Join, left: LogicalPlan, right: LogicalPlan,
                              cond: Expression, la: Expression, rb: Expression,
                              r: Double, cs: Double, cap: Long): LogicalPlan = {
    // envelope computed once per row, the empty check referencing the
    // attribute in a second Project (CollapseProject keeps multi-use
    // non-cheap aliases, so the WKB parse stays single)
    def checkedEnv(plan: LogicalPlan, e: Expression, raw: String,
                   name: String): (LogicalPlan, Attribute) = {
      val env = Alias(StEnvelopeBounds(e), raw)()
      val inner = Project(plan.output :+ env, plan)
      def it(i: Int) = GetArrayItem(env.toAttribute, Literal(i))
      val msg = Literal(
        "GridSpatialJoin: EMPTY geometry in a distance join - JTS " +
          "distance(EMPTY, g) = 0 matches every row, which the grid " +
          s"rewrite cannot reproduce; filter empties upstream or unset $sizeKey.")
      val checked = Alias(CaseWhen(Seq(
          (IsNull(env.toAttribute), env.toAttribute),
          (LessThanOrEqual(it(0), it(2)), env.toAttribute)),
        Some(Cast(new RaiseError(msg),
          ArrayType(DoubleType, containsNull = false)))), name)()
      (Project(plan.output :+ checked, inner), checked.toAttribute)
    }
    val (aProj, aEnvA) = checkedEnv(left, la, "_graft_daenv0", "_graft_daenv")
    val (bProj, bEnvA) = checkedEnv(right, rb, "_graft_dbenv0", "_graft_dbenv")
    def aItem(i: Int) = GetArrayItem(aEnvA, Literal(i))
    def bItem(i: Int) = GetArrayItem(bEnvA, Literal(i))
    val rl = Literal(r)
    val (acx, acy, aLoX, aLoY, aSide) = explodeRange(aProj,
      aItem(0), aItem(1), aItem(2), aItem(3),
      "_graft_dacx", "_graft_dacy", cs, cap)
    val (bcx, bcy, bLoX, bLoY, bSide) = explodeRange(bProj,
      Subtract(bItem(0), rl), Subtract(bItem(1), rl),
      Add(bItem(2), rl), Add(bItem(3), rl),
      "_graft_dbcx", "_graft_dbcy", cs, cap)
    // exactly-once: the pair fires only in the reference cell — the
    // max of the two range lows, in both ranges whenever they overlap
    val refCell = And(
      EqualTo(acx, Greatest(Seq(aLoX, bLoX))),
      EqualTo(acy, Greatest(Seq(aLoY, bLoY))))
    // envelope-gap prefilter: per-axis interval gap, clamped at 0;
    // dist(a, b) >= sqrt(gx² + gy²), so gx² + gy² > r² kills the
    // candidate before the JTS distance in the retained condition
    def gap(lo1: Expression, hi1: Expression,
            lo2: Expression, hi2: Expression): Expression =
      Greatest(Seq(Subtract(lo1, hi2), Subtract(lo2, hi1), Literal(0.0)))
    val gx = gap(aItem(0), aItem(2), bItem(0), bItem(2))
    val gy = gap(aItem(1), aItem(3), bItem(1), bItem(3))
    val pre = LessThanOrEqual(Add(Multiply(gx, gx), Multiply(gy, gy)),
      Literal(r * r))
    val joinCond = And(And(EqualTo(acx, bcx), EqualTo(acy, bcy)),
      And(refCell, And(pre, cond)))
    val joined = Join(aSide, bSide, Inner, Some(joinCond), JoinHint.NONE)
    Project(j.output, joined)
  }

  /**
   * GEODESIC distance-join rewrite (opt-in via
   * `spark.graft.spatialJoin.geodesic = true`): a conjunct
   * `st_distance_spherical(a, b) <= r` (either literal order, `<=` or
   * `<`, the sphere radius a plan-time literal) becomes a CHORD-SPACE
   * cell equi-join. Great-circle distance ≤ r on a sphere of radius R
   * is EQUIVALENT to 3D chord ‖p − q‖ ≤ c = 2R·sin(min(r/2R, π/2)), so
   * gridding the [[graft.functions.GeoChordXyz]] embedding at cell
   * size c is a sound candidate generator with NO latitude bands, NO
   * antimeridian seam and NO polar case — and, because a point owns
   * exactly ONE cell on the probe side while the build side explodes
   * to the ≤ 3³ = 27 cells of its c-grown cube, exactly-once is
   * structural and the fan-out is a CONSTANT (no cellSize knob, no
   * explode cap). A slackened chord-squared prefilter (c grown by
   * 1 ppb + 1 µm, covering cross-path trig ulps) runs ahead of the
   * exact haversine in the retained original condition. Like the
   * planar distance branch: `> r` / `>= r` (near-cross-products) do
   * NOT rewrite, NULL geometry → NULL cells → no match (the nested
   * loop's no-match), and non-POINT geometry REFUSES loudly — on the
   * cell computation here, in the verify there; the one observable
   * deviation is a non-point row whose join's OTHER side is empty
   * (the nested loop never evaluates, the rewrite still raises),
   * accepted for the same reason as the planar EMPTY refusal.
   */
  private def rewriteGeo(j: Join, left: LogicalPlan, right: LogicalPlan,
                         cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def crossSide(e: Expression): Boolean =
      e.references.intersect(left.outputSet).nonEmpty &&
        e.references.intersect(right.outputSet).nonEmpty
    if (conjuncts.exists {
      case eq @ EqualTo(_, _) => crossSide(eq)
      case _ => false
    }) return None
    def sideOf(e: Expression): Int = {
      val refs = e.references
      if (refs.nonEmpty && refs.subsetOf(left.outputSet)) 0
      else if (refs.nonEmpty && refs.subsetOf(right.outputSet)) 1
      else -1
    }
    def geoCase(ea: Expression, eb: Expression, bigR: Double, r: Double)
        : Option[(Expression, Expression, Double, Double)] =
      if (r > 0 && !r.isInfinite && !r.isNaN && bigR > 0 &&
          sideOf(ea) >= 0 && sideOf(eb) >= 0 && sideOf(ea) != sideOf(eb))
        Some(if (sideOf(ea) == 0) (ea, eb, bigR, r) else (eb, ea, bigR, r))
      else None
    conjuncts.iterator.map {
      case LessThanOrEqual(
          StDistanceSpherical(GeomExpr(a), GeomExpr(b), DoubleLit(bigR)),
          DoubleLit(r)) => geoCase(a, b, bigR, r)
      case LessThan(
          StDistanceSpherical(GeomExpr(a), GeomExpr(b), DoubleLit(bigR)),
          DoubleLit(r)) => geoCase(a, b, bigR, r)
      case GreaterThanOrEqual(DoubleLit(r),
          StDistanceSpherical(GeomExpr(a), GeomExpr(b), DoubleLit(bigR))) =>
        geoCase(a, b, bigR, r)
      case GreaterThan(DoubleLit(r),
          StDistanceSpherical(GeomExpr(a), GeomExpr(b), DoubleLit(bigR))) =>
        geoCase(a, b, bigR, r)
      case _ => None
    }.collectFirst { case Some(h) => h }
      .map { case (la, rb, bigR, r) =>
        rewriteGeoDistance(j, left, right, cond, la, rb, bigR, r) }
  }

  private def rewriteGeoDistance(j: Join, left: LogicalPlan, right: LogicalPlan,
                                 cond: Expression, la: Expression, rb: Expression,
                                 bigR: Double, r: Double): LogicalPlan = {
    // chord bound, grown by 1 ppb + 1 µm: covers the ulp gap between the
    // haversine the verify computes and the trig path the cells compute
    val c = 2.0 * bigR * math.sin(math.min(r / (2.0 * bigR), math.Pi / 2.0))
    val cg = c * (1.0 + 1e-9) + 1e-6
    val cs = cg // ≤ 3 cells per axis on the grown side, always
    def xyzOf(plan: LogicalPlan, e: Expression, name: String)
        : (LogicalPlan, Attribute) = {
      val a = Alias(GeoChordXyz(e, Literal(bigR)), name)()
      (Project(plan.output :+ a, plan), a.toAttribute)
    }
    val (aProj, aXyz) = xyzOf(left, la, "_graft_gsxyza")
    val (bProj, bXyz) = xyzOf(right, rb, "_graft_gsxyzb")
    def item(att: Attribute, i: Int) = GetArrayItem(att, Literal(i))
    def cell(e: Expression) = Floor(Divide(e, Literal(cs)))
    // probe side: ONE cell per axis
    val aCells = (0 to 2).map(i =>
      Alias(cell(item(aXyz, i)), s"_graft_gsca$i")())
    val aSide = Project(aProj.output ++ aCells, aProj)
    // build side: explode the c-grown cube's cell ranges, axis by axis
    var bPlan: LogicalPlan = bProj
    val bCells = (0 to 2).map { i =>
      val lo = cell(Subtract(item(bXyz, i), Literal(cg)))
      val hi = cell(Add(item(bXyz, i), Literal(cg)))
      val out = AttributeReference(s"_graft_gscb$i", LongType, nullable = false)()
      bPlan = Generate(Explode(new Sequence(lo, hi, Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(out), child = bPlan)
      out
    }
    val equi = (0 to 2).map(i => EqualTo(aCells(i).toAttribute, bCells(i)))
      .reduce[Expression](And)
    // conservative chord² prefilter ahead of the exact haversine in cond
    val d2 = (0 to 2).map { i =>
      val d = Subtract(item(aXyz, i), item(bXyz, i))
      Multiply(d, d): Expression
    }.reduce[Expression]((x, y) => Add(x, y))
    val pre = LessThanOrEqual(d2, Literal(cg * cg))
    val joined = Join(aSide, bPlan, Inner,
      Some(And(equi, And(pre, cond))), JoinHint.NONE)
    Project(j.output, joined)
  }
}
