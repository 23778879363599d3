package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.union.UnaryUnionOp

import graft.core.GeoOps

/**
 * Geometry-union buffer with CASCADED collapse: naive row-by-row
 * `union` over n overlapping polygons costs O(n) overlay passes each
 * touching an ever-growing result; JTS's `UnaryUnionOp` unions a BATCH
 * with spatial partitioning (the cascaded-union algorithm, Boissonnat),
 * so the buffer accumulates geometries and collapses every
 * `batch`-full — per-row amortized cost stays near the cascaded
 * optimum while the buffer never holds more than `batch` geometries.
 */
final class GeoUnionBuffer {
  val geoms = new java.util.ArrayList[Geometry]()
  def add(g: Geometry, batch: Int): Unit = {
    geoms.add(g)
    if (geoms.size >= batch) collapse()
  }
  def collapse(): Unit =
    if (geoms.size > 1) {
      val u = UnaryUnionOp.union(geoms)
      geoms.clear(); geoms.add(u)
    }
}

/**
 * `st_union_agg(geom)` — the DISSOLVE aggregate (PostGIS `ST_Union(geometry)`
 * aggregate form): the union of every geometry in the group. NULLs are
 * skipped; an all-NULL/empty group yields NULL (the PostGIS contract).
 *
 * Scale: `TypedImperativeAggregate` gives map-side partial aggregation —
 * each partition unions ITS rows down to one geometry, and the shuffle
 * carries one WKB per (partition, group), never the row set. That is
 * the dissolve scale path: at 100 TB the reduce side unions
 * |partitions| partial geometries, not |rows|. The cascaded batch
 * collapse (see [[GeoUnionBuffer]]) bounds both per-row cost and
 * buffer memory; a pathological group whose UNION ITSELF is huge
 * (millions of disjoint parcels dissolving to a multipolygon of every
 * vertex) is output-bound by nature — no aggregation strategy shrinks
 * an irreducible result.
 */
case class StUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GeoUnionBuffer] {

  private val batch = 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GeoUnionBuffer = new GeoUnionBuffer

  override def update(buf: GeoUnionBuffer, input: InternalRow): GeoUnionBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(GeoOps.read(v.asInstanceOf[Array[Byte]]), batch)
    buf
  }

  override def merge(a: GeoUnionBuffer, b: GeoUnionBuffer): GeoUnionBuffer = {
    val it = b.geoms.iterator()
    while (it.hasNext) a.add(it.next(), batch)
    a
  }

  override def eval(buf: GeoUnionBuffer): Any =
    if (buf.geoms.isEmpty) null
    else { buf.collapse(); GeoOps.write(buf.geoms.get(0)) }

  override def serialize(buf: GeoUnionBuffer): Array[Byte] = {
    buf.collapse() // ship ONE geometry per partial, not the batch
    val payloads = new Array[Array[Byte]](buf.geoms.size)
    var total = 4
    var i = 0
    while (i < buf.geoms.size) {
      payloads(i) = GeoOps.write(buf.geoms.get(i)); total += 4 + payloads(i).length
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(payloads.length)
    payloads.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GeoUnionBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new GeoUnionBuffer
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val p = new Array[Byte](bb.getInt()); bb.get(p)
      buf.geoms.add(GeoOps.read(p))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): StUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): StUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0))
  override def prettyName: String = "st_union_agg"
}
