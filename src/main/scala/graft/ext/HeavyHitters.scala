package graft.ext

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries frequent-items summary (Misra & Gries 1982), in the
 * MERGEABLE form of Agarwal et al., "Mergeable Summaries" (PODS 2012):
 * at most `k` counters per buffer; an unseen item beyond capacity
 * decrements every counter (each decrement is paid for by a prior
 * increment — amortized O(1)); merging sums counters and, past
 * capacity, subtracts the (k+1)-th largest from all and drops the
 * non-positive. The guarantee survives ARBITRARY merge orders: every
 * counter underestimates its item's true count by at most n/(k+1), so
 * any item with true count > n/(k+1) is present in the summary — which
 * is exactly what makes the two-pass [[HeavyHitters.frequentItems]]
 * deterministic even though individual counter VALUES depend on merge
 * order.
 */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long]()
  var n: Long = 0L

  def add(item: String): Unit = {
    n += 1
    val cur = counts.get(item)
    if (cur != null) { counts.put(item, cur + 1L); () }
    else if (counts.size < k) { counts.put(item, java.lang.Long.valueOf(1L)); () }
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeFrom(o: MgBuffer): Unit = {
    n += o.n
    o.counts.forEach { (s, c) =>
      counts.merge(s, c, (x, y) => java.lang.Long.valueOf(x + y)); ()
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      var i = 0
      counts.values.forEach { v => vals(i) = v; i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // the (k+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
  }
}

/** `mg_sketch(value, k)` → struct<n: bigint, items: array<struct<item:
  * string, est: bigint>>> (items sorted est desc, item asc). The
  * counter VALUES are merge-order-dependent (inherent to MG) — consume
  * the item SET plus `n`, as [[HeavyHitters.frequentItems]] does; never
  * hash-compare raw sketches. NULL values are ignored (not counted in
  * n). */
case class MgSketch(valueExpr: Expression, kExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(valueExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def createAggregationBuffer(): MgBuffer = {
    require(k >= 1, s"mg_sketch: k must be >= 1, got $k")
    new MgBuffer(k)
  }

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = valueExpr.eval(input)
    // UTF8String buffers are reused between rows — materialize
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(buf: MgBuffer): Any = {
    val items = new Array[(String, Long)](buf.counts.size)
    var i = 0
    buf.counts.forEach { (s, c) => items(i) = (s, c.longValue()); i += 1 }
    val sorted = items.sortBy { case (s, c) => (-c, s) }
    InternalRow(buf.n, new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any]))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.counts.size)
    var bytes = 4 + 8 + 4
    buf.counts.forEach { (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      entries.add((b, c.longValue())); bytes += 4 + b.length + 8; ()
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.k); bb.putLong(buf.n); bb.putInt(entries.size)
    entries.forEach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c); ()
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt())
    buf.n = bb.getLong()
    val sz = bb.getInt()
    var i = 0
    while (i < sz) {
      val len = bb.getInt()
      val b = new Array[Byte](len); bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8),
        java.lang.Long.valueOf(bb.getLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MgSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(valueExpr = c(0), kExpr = c(1))
  override def prettyName: String = "mg_sketch"
}

/**
 * Exact heavy hitters at scale — the standard TWO-PASS composition:
 * pass 1 runs ONE [[MgSketch]] aggregate (k = ⌈1/phi⌉ counters per
 * partial buffer, map-side combined — the shuffle carries k counters
 * per partition, never the full distinct-item aggregate a plain
 * groupBy would build over billions of distinct values); pass 2
 * exact-counts only the ≤ k candidates (an `isin` filter that pushes
 * into the scan) and keeps those with count > phi·n. MG's merge-robust
 * guarantee (every item with true count > n/(k+1) survives pass 1, and
 * n/(k+1) < phi·n at this k) makes the OUTPUT deterministic and
 * oracle-checkable even though sketch internals vary with merge order.
 */
object HeavyHitters {

  def mg_sketch(value: Column, k: Int): Column =
    call_function("mg_sketch", value, lit(k))

  /** (item, cnt) for every value with exact count > phi·n (n = non-null
    * rows), deterministic. `phi` in (0, 1); small phi needs ⌈1/phi⌉
    * candidate counters — bounded by `maxCandidates` loudly (the
    * driver holds one candidate list; a 1e-7 phi wants a different
    * algorithm). */
  def frequentItems(df: DataFrame, valueCol: String, phi: Double,
                    maxCandidates: Int = 65536): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi in (0, 1), got $phi")
    val k = math.ceil(1.0 / phi).toInt
    require(k <= maxCandidates,
      s"frequentItems: phi=$phi needs $k candidate counters " +
        s"(> maxCandidates=$maxCandidates) — raise the cap deliberately " +
        "or use a plain groupBy at this selectivity.")
    TextFunctions.registerAll(df.sparkSession)
    val row = df.select(mg_sketch(col(valueCol), k).as("s")).head()
    val st = row.getStruct(0)
    val n = st.getLong(0)
    val cands = st.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    val spark = df.sparkSession
    import spark.implicits._
    if (n == 0L || cands.isEmpty)
      return Seq.empty[(String, Long)].toDF("item", "cnt")
    df.filter(col(valueCol).isin(cands: _*))
      .groupBy(col(valueCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(phi) * lit(n.toDouble))
  }
}
