package graft.ext

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Bounded buffer of the k best (score desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // parallel arrays as a binary min-heap ordered by (score asc, id desc):
  // the root is the WORST kept element, evicted when a better one arrives
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  private def worse(i: Int, j: Int): Boolean =
    scores(i) < scores(j) || (scores(i) == scores(j) && ids(i) > ids(j))

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < size && worse(l, m)) m = l
      if (r < size && worse(r, m)) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(i, p)) { swap(i, p); i = p } else return
    }
  }

  def add(id: Long, score: Double): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 &&
        (score > scores(0) || (score == scores(0) && id < ids(0)))) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  /** (id, score) pairs sorted by score desc, id asc. */
  def sorted: Array[(Long, Double)] = {
    val out = (0 until size).map(i => (ids(i), scores(i))).toArray
    out.sortBy { case (id, s) => (-s, id) }
  }
}

/**
 * Bounded top-k aggregate (`TypedImperativeAggregate`): keeps only the k
 * best (score, id) pairs per group in a fixed-size heap, with map-side
 * partial aggregation — the scale path for per-query top-k that replaces
 * `row_number().over(Window)`'s full sort+shuffle of every scored row.
 * At 100 TB the shuffle carries k pairs per group instead of the whole
 * scored cross product.
 *
 * Output: array<struct<id:bigint, score:double>> sorted by
 * (score desc, id asc) — deterministic tie-breaking.
 */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null)
      buf.add(id.asInstanceOf[Number].longValue(),
        score.asInstanceOf[Number].doubleValue())
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.ids(i), b.scores(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (id, s) =>
      InternalRow(id, s)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(idExpr = c(0), scoreExpr = c(1), kExpr = c(2))
  override def prettyName: String = "topk_by_score"
}

object TopKAggregate {
  /** Column API: `topk_by_score(id, score, k)`. Register via TextFunctions. */
  def topk_by_score(id: Column, score: Column, k: Int): Column =
    call_function("topk_by_score", id, score, lit(k))
}
