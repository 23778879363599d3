package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
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
      stats(child) match {
        case Some(Seq(minx, miny, maxx, maxy)) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val extra = conjuncts.flatMap {
            case StRelation(mode, q, g) if q.foldable && g.isInstanceOf[Attribute] =>
              prefilter(mode, q, minx, miny, maxx, maxy, queryFirst = true)
            case StRelation(mode, g, q) if q.foldable && g.isInstanceOf[Attribute] =>
              prefilter(mode, q, minx, miny, maxx, maxy, queryFirst = false)
            case _ => None
          }
          if (extra.isEmpty) f
          else Filter((conjuncts ++ extra).reduce(And), child)
        case _ => f
      }
  }

  private def references(e: Expression, names: Seq[String]): Boolean =
    e.collectFirst { case a: Attribute if names.contains(a.name) => a }.isDefined

  /** The four stat attributes, if the child exposes all of them. */
  private def stats(child: LogicalPlan): Option[Seq[Attribute]] = {
    val byName = child.output.groupBy(_.name)
    val found = statNames.flatMap(n => byName.get(n).map(_.head))
    if (found.length == 4) Some(found) else None
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
