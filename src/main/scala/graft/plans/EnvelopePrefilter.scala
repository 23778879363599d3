package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.core.GeoOps
import graft.functions.StRelation

/**
 * Optimizer rule (SURVEY.md §4 R3): under any conjunctive `st_<mode>`
 * predicate whose query geometry is foldable (a literal envelope/point),
 * inject a numeric prefilter on the collection's materialized `_bbox_*`
 * stat columns. Spark's own pushdown then drives the conjuncts into the
 * Parquet scan, where row-group min/max pruning skips whole blocks — the
 * engine's GIST-index replacement, now applied automatically to ANY user
 * query, not just the engine's bbox operator.
 *
 * Soundness: injection only for top-level conjuncts (never inside OR);
 * every non-disjoint DE-9IM relation implies envelope intersection, and
 * contains(bbox, geom) strengthens to envelope containment. Idempotent:
 * skips filters that already reference a stat column.
 */
object EnvelopePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private val statNames = Seq("_bbox_minx", "_bbox_miny", "_bbox_maxx", "_bbox_maxy")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !references(cond, statNames) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def extrasFor(target: LogicalPlan): Seq[Expression] = conjuncts.flatMap {
        case StRelation(mode, q, g: Attribute) if q.foldable =>
          statsFor(target, g).flatMap { s =>
            prefilter(mode, q, s(0), s(1), s(2), s(3), queryFirst = true)
          }
        case StRelation(mode, g: Attribute, q) if q.foldable =>
          statsFor(target, g).flatMap { s =>
            prefilter(mode, q, s(0), s(1), s(2), s(3), queryFirst = false)
          }
        case _ => None
      }
      val direct = extrasFor(child)
      if (direct.nonEmpty) Filter((conjuncts ++ direct).reduce(And), child)
      else child match {
        // stat columns pruned away by a projection — the shape of every
        // registered temp view (readCollection selects the user schema).
        // Inject the prefilter BELOW the project, where the stats are
        // still visible; sound because the conjunct is implied by `cond`.
        case Project(projList, grandchild) =>
          // idempotency: the outer Filter's condition never gains stat
          // refs, so the :29 guard alone doesn't stop re-application when
          // this rule runs to fixed point on its own (it is registered via
          // extraOptimizations). A stat-referencing Filter directly under
          // the Project can only be a previous injection — skip.
          val alreadyInjected = grandchild match {
            case Filter(gcond, _) => references(gcond, statNames)
            case _ => false
          }
          val below = if (alreadyInjected) Seq.empty else extrasFor(grandchild)
          if (below.isEmpty) f
          else Filter(cond, Project(projList, Filter(below.reduce(And), grandchild)))
        case _ => f
      }
  }

  private def references(e: Expression, names: Seq[String]): Boolean =
    e.collectFirst { case a: Attribute if names.contains(a.name) => a }.isDefined

  /**
   * The four stat attributes belonging to the SAME leaf relation as the
   * geometry attribute, and still visible through `child`'s output.
   * Resolving by name alone would, in a join/self-join of two stat-bearing
   * frames, inject a prefilter on table A's stats for a predicate on table
   * B's geometry — silently dropping rows. Matching exprId origin (and
   * bailing on ambiguity) makes the injection sound under joins.
   */
  private def statsFor(child: LogicalPlan, geom: Attribute): Option[Seq[Attribute]] = {
    val owners = child.collectLeaves()
      .filter(_.output.exists(_.exprId == geom.exprId))
    owners match {
      case Seq(leaf) =>
        val byName = leaf.output.groupBy(_.name)
        val found = statNames.flatMap { n =>
          byName.getOrElse(n, Seq.empty) match {
            case Seq(one) => Some(one)
            case _ => None // missing or ambiguous
          }
        }
        val visible = child.outputSet
        if (found.length == 4 && found.forall(visible.contains)) Some(found)
        else None
      case _ => None // geometry attr aliased away or from no unique leaf
    }
  }

  private def prefilter(mode: String, queryGeom: Expression,
                        minx: Attribute, miny: Attribute,
                        maxx: Attribute, maxy: Attribute,
                        queryFirst: Boolean): Option[Expression] = {
    val wkb = queryGeom.eval() match {
      case b: Array[Byte] => b
      case _ => return None
    }
    val (qMinX, qMinY, qMaxX, qMaxY) =
      (GeoOps.xMin(wkb), GeoOps.yMin(wkb), GeoOps.xMax(wkb), GeoOps.yMax(wkb))
    def le(a: Expression, v: Double) = LessThanOrEqual(a, Literal(v))
    def ge(a: Expression, v: Double) = GreaterThanOrEqual(a, Literal(v))
    mode.toLowerCase match {
      case "disjoint" => None // no envelope implication
      case "contains" | "equals" if queryFirst =>
        // query bbox contains row geometry => row envelope inside query bbox
        Some(Seq(ge(minx, qMinX), le(maxx, qMaxX), ge(miny, qMinY), le(maxy, qMaxY))
          .reduce[Expression](And))
      case "within" if !queryFirst =>
        // row geometry within query geometry: same containment direction
        Some(Seq(ge(minx, qMinX), le(maxx, qMaxX), ge(miny, qMinY), le(maxy, qMaxY))
          .reduce[Expression](And))
      case _ =>
        // any other true relation implies envelope intersection
        Some(Seq(le(minx, qMaxX), ge(maxx, qMinX), le(miny, qMaxY), ge(maxy, qMinY))
          .reduce[Expression](And))
    }
  }
}
