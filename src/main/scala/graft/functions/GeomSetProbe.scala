package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

import graft.core.GeoOps

/**
 * The probe side of [[graft.core.SpatialJoin.broadcastPointJoin]]: a
 * Spark-`Broadcast` WKB set indexed by a per-executor JTS STRtree of
 * PREPARED geometries (JTS 1.20 prepared geometries lazy-build their
 * indexes under `synchronized`, so one instance serves every task
 * thread). The holder serializes as (uuid, broadcast handle) — tasks
 * deserialize a few bytes, fetch the WKB blob once per executor via
 * torrent broadcast, and share the built tree through a content-keyed
 * JVM cache. Verification is [[GeoOps.relatePointPrepared]], the SAME
 * kernel `pointJoin`'s StRelationXY delegates to — the two joins are
 * row-identical by construction.
 */
final class GeomSetHolder(val id: String, val modeId: Int,
                          val bc: Broadcast[Array[Array[Byte]]])
    extends Serializable {

  /** All geometry indices whose envelope covers (x, y) AND whose DE-9IM
    * relation to the point holds — a sorted int array (ascending by
    * construction: STRtree returns arbitrary order, so we sort for a
    * deterministic explode order). */
  def probe(x: Double, y: Double): ArrayData = {
    val (tree, preps) = GeomSetHolder.bundleFor(id, bc)
    val cands = tree.query(new org.locationtech.jts.geom.Envelope(x, x, y, y))
    if (cands.isEmpty) GeomSetHolder.EmptyInts
    else {
      var out: Array[Int] = null
      var n = 0
      var i = 0
      while (i < cands.size()) {
        val idx = cands.get(i).asInstanceOf[Integer].intValue()
        if (GeoOps.relatePointPrepared(modeId, preps(idx), x, y)) {
          if (out == null) out = new Array[Int](cands.size())
          out(n) = idx; n += 1
        }
        i += 1
      }
      if (n == 0) GeomSetHolder.EmptyInts
      else {
        val trimmed = java.util.Arrays.copyOf(out, n)
        java.util.Arrays.sort(trimmed)
        new GenericArrayData(trimmed)
      }
    }
  }
}

object GeomSetHolder {
  private val EmptyInts = new GenericArrayData(Array.empty[Int])

  // per-JVM (tree, prepared) cache keyed by holder uuid: each task
  // deserializes its own tiny holder, but the expensive build runs once
  // per executor. Crude bound like SpatialJoin's old row cache: clear
  // past 8 distinct geometry sets instead of pinning old ones.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, (org.locationtech.jts.index.strtree.STRtree,
             Array[org.locationtech.jts.geom.prep.PreparedGeometry])]()

  private def bundleFor(id: String, bc: Broadcast[Array[Array[Byte]]]) = {
    if (cache.size > 8) cache.clear()
    cache.computeIfAbsent(id, _ => {
      val wkbs = bc.value
      val tree = new org.locationtech.jts.index.strtree.STRtree()
      val preps =
        new Array[org.locationtech.jts.geom.prep.PreparedGeometry](wkbs.length)
      var i = 0
      while (i < wkbs.length) {
        val g = GeoOps.read(wkbs(i))
        tree.insert(g.getEnvelopeInternal, Integer.valueOf(i))
        preps(i) =
          org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(g)
        i += 1
      }
      tree.build()
      (tree, preps)
    })
  }
}

/** `geomset_probe(x, y)` → sorted int array of matching geometry
  * indices; the holder ships via `addReferenceObj` (the StTransform
  * snapshot pattern), so generated code is one virtual call per row —
  * the probe stays inside whole-stage codegen. */
case class GeomSetProbe(holder: GeomSetHolder,
                        left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geomset_probe"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    holder.probe(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("geomSet", holder,
      classOf[GeomSetHolder].getName)
    defineCodeGen(ctx, ev, (x, y) => s"$ref.probe($x, $y)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
