package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/**
 * Binary (1-bit) vector quantization runtime — the faiss
 * `IndexBinaryFlat` regime: each dimension contributes one bit
 * (`x_i > t_i`), bits pack little-endian into `long` words, and distance
 * is the Hamming weight of the XOR — 64 dimensions per CPU instruction
 * via `Long.bitCount`. Same kernel pattern as [[PqKernel]]: the
 * threshold vector / packed query ride `ctx.addReferenceObj`, generated
 * code is ONE static call regardless of dimensionality.
 *
 * Cross-engine contract (the q189 oracle replays it in DuckDB): the bit
 * is the EXACT comparison `(double) x_i > t_i` — floats widen to double
 * losslessly, so both engines compute the identical bit, and Hamming is
 * integer arithmetic with no accumulation-order concerns at all.
 */
object BinKernel {

  /** Pack `vec` (read as doubles at offsets 0..d) into ceil(d/64) words;
    * bit i of word i>>>6 is `vec(i) > thresholds(i)`. NULL elements and
    * dimension mismatches are refused loudly. */
  def pack(vec: ArrayData, thresholds: Array[Double]): ArrayData = {
    val d = thresholds.length
    if (vec.numElements() != d)
      throw new IllegalArgumentException(
        s"binary_quantize: vector dim ${vec.numElements()} != thresholds dim $d")
    val words = new Array[Long]((d + 63) >>> 6)
    var i = 0
    while (i < d) {
      if (vec.isNullAt(i))
        throw new IllegalArgumentException(
          s"binary_quantize: NULL vector element at index $i")
      if (vec.getDouble(i) > thresholds(i)) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(words)
  }

  /** Driver-side twin of [[pack]] — used on query vectors so the packed
    * query is bit-identical to what the corpus rows went through. */
  def packLocal(vec: Array[Double], thresholds: Array[Double]): Array[Long] = {
    require(vec.length == thresholds.length,
      s"binary_quantize: vector dim ${vec.length} != thresholds dim ${thresholds.length}")
    val words = new Array[Long]((vec.length + 63) >>> 6)
    var i = 0
    while (i < vec.length) {
      if (vec(i) > thresholds(i)) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }

  /** Hamming distance of a packed code column value to the packed query:
    * Σ popcount(code_w XOR q_w). Word-count mismatch refused loudly. */
  def hamming(code: ArrayData, q: Array[Long]): Int = {
    if (code.numElements() != q.length)
      throw new IllegalArgumentException(
        s"hamming: code words ${code.numElements()} != query words ${q.length}")
    var h = 0
    var w = 0
    while (w < q.length) {
      if (code.isNullAt(w))
        throw new IllegalArgumentException(s"hamming: NULL code word at $w")
      h += java.lang.Long.bitCount(code.getLong(w) ^ q(w))
      w += 1
    }
    h
  }
}

/** `binary_quantize(vec)` → packed `Array[Long]` sign/threshold code.
  * Thresholds ride [[org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext#addReferenceObj]]. */
case class BinPackExpr(child: Expression, thresholds: Array[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "binary_quantize"
  override protected def nullSafeEval(vec: Any): Any =
    BinKernel.pack(vec.asInstanceOf[ArrayData], thresholds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("binThresholds", thresholds, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.ext.BinKernel.pack($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `hamming(code)` → Hamming distance to ONE packed query vector. */
case class HammingExpr(child: Expression, query: Array[Long])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming"
  override protected def nullSafeEval(code: Any): Any =
    BinKernel.hamming(code.asInstanceOf[ArrayData], query)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("binQuery", query, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.ext.BinKernel.hamming($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BinFunctions {
  def binary_quantize(vec: Column, thresholds: Array[Double]): Column =
    Bridge.column(BinPackExpr(Bridge.expression(vec), thresholds))
  def hamming(code: Column, query: Array[Long]): Column =
    Bridge.column(HammingExpr(Bridge.expression(code), query))
}
