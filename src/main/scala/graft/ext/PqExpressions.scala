package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * The product-quantization runtime kernel (Jégou, Douze & Schmid, TPAMI
 * 2011): plain-Java loops over a `double[][]`/`double[][][]` codebook that
 * the expressions below ship to executors via `ctx.addReferenceObj` — the
 * same snapshot pattern as `StTransform`'s CRS map. This replaces the
 * earlier literal when-chain/struct-argmin expression trees, whose size
 * grew as m·k·dsub terms: at the production regime (k=256, d=768) those
 * trees blow past the JVM 64 KB method limit and fall back to interpreted
 * eval, while this kernel's GENERATED code is one static call regardless
 * of k — constant code size, per-row cost linear in k like the math
 * itself.
 *
 * Float-pinning contract (the q150/q151 oracle replays these numbers in
 * another engine): every per-centroid distance is the EXPLICIT
 * left-associated sum of `(x_i - c_i)^2` in doubles — the `while` loops
 * below accumulate in exactly that order, bit-identical to the old
 * expression trees — and argmin ties break to the smaller centroid index
 * (strict `<` keeps the earlier j).
 */
object PqKernel {

  /** Left-associated Σ (vec[off+i] - c[i])² in doubles. Null elements are
    * refused loudly — a silent 0.0 would corrupt the argmin. */
  def dist(vec: ArrayData, off: Int, c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) {
      if (vec.isNullAt(off + i))
        throw new IllegalArgumentException(
          s"pq: NULL vector element at index ${off + i}")
      val x = vec.getDouble(off + i) - c(i)
      d += x * x
      i += 1
    }
    d
  }

  /** Squared-L2 argmin of vec[off..off+dsub) over `cents`; ties to the
    * smaller index (init at j=0, strict `<` thereafter — an all-NaN
    * distance row also lands on 0, matching the old struct-min). */
  def argmin(vec: ArrayData, off: Int, cents: Array[Array[Double]]): Int = {
    var bestJ = 0
    var bestD = dist(vec, off, cents(0))
    var j = 1
    while (j < cents.length) {
      val d = dist(vec, off, cents(j))
      if (d < bestD) { bestD = d; bestJ = j }
      j += 1
    }
    bestJ
  }

  /** Full-vector PQ encoding: the length-m int code array. */
  def encode(vec: ArrayData, centroids: Array[Array[Array[Double]]]): ArrayData = {
    val m = centroids.length
    val dsub = centroids(0)(0).length
    if (vec.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector dim ${vec.numElements()} != m*dsub = ${m * dsub}")
    val code = new Array[Int](m)
    var s = 0
    while (s < m) { code(s) = argmin(vec, s * dsub, centroids(s)); s += 1 }
    new GenericArrayData(code)
  }

  /** Training-loop assignment over the slim (s, sub) frame: argmin of the
    * dsub-slice `sub` against subspace `s`'s centroids. */
  def assignSub(s: Int, sub: ArrayData,
                centroids: Array[Array[Array[Double]]]): Int = {
    if (s < 0 || s >= centroids.length)
      throw new IllegalArgumentException(
        s"pq_assign: subspace $s out of range [0, ${centroids.length})")
    val dsub = centroids(s)(0).length
    if (sub.numElements() != dsub)
      throw new IllegalArgumentException(
        s"pq_assign: slice dim ${sub.numElements()} != dsub = $dsub")
    argmin(sub, 0, centroids(s))
  }

  /** Per-subspace QUANTIZATION error over the slim (s, sub) frame: the
    * argmin's own squared-L2 distance — Σ over rows is the corpus's PQ
    * reconstruction error, the objective OPQ minimizes. */
  def minDistSub(s: Int, sub: ArrayData,
                 centroids: Array[Array[Array[Double]]]): Double = {
    if (s < 0 || s >= centroids.length)
      throw new IllegalArgumentException(
        s"pq_min_dist: subspace $s out of range [0, ${centroids.length})")
    val dsub = centroids(s)(0).length
    if (sub.numElements() != dsub)
      throw new IllegalArgumentException(
        s"pq_min_dist: slice dim ${sub.numElements()} != dsub = $dsub")
    val j = argmin(sub, 0, centroids(s))
    dist(sub, 0, centroids(s)(j))
  }

  /** ADC lookup: Σ_s table(s)(code(s)), left-associated — `table(s)(j)` is
    * the driver-precomputed distance of the query's subspace-s slice to
    * centroid j (itself summed in the same left-associated term order). */
  /** Batch-query ADC: one distance per query from a stacked table —
    * the corpus is scanned ONCE for the whole query set. */
  def adcMulti(code: ArrayData,
               tables: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Double](tables.length)
    var qi = 0
    while (qi < tables.length) { out(qi) = adc(code, tables(qi)); qi += 1 }
    new GenericArrayData(out)
  }

  def adc(code: ArrayData, table: Array[Array[Double]]): Double = {
    val m = table.length
    if (code.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc: code length ${code.numElements()} != m = $m")
    var d = 0.0
    var s = 0
    while (s < m) {
      if (code.isNullAt(s))
        throw new IllegalArgumentException(s"pq_adc: NULL code at subspace $s")
      val j = code.getInt(s)
      if (j < 0 || j >= table(s).length)
        throw new IllegalArgumentException(
          s"pq_adc: code $j out of range [0, ${table(s).length}) in subspace $s")
      d += table(s)(j)
      s += 1
    }
    d
  }
}

/** `pq_encode(vec)` → length-m int code array. The codebook rides as a
  * CONSTRUCTOR field (not a private val) for the same reason as
  * `StTransform.crsSnap`: two nodes built from different trained models
  * must compare unequal (Array equality is reference equality —
  * conservative, never wrongly equal), or subexpression elimination could
  * substitute a stale codebook. `ImplicitCastInputTypes` upcasts
  * `array<float>` corpora to `array<double>` per element — the same
  * widening the old `element_at(...).cast("double")` trees applied. */
case class PqEncodeExpr(child: Expression,
                        centroids: Array[Array[Array[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(v: Any): Any =
    PqKernel.encode(v.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCentroids", centroids, "double[][][]")
    defineCodeGen(ctx, ev, a => s"graft.ext.PqKernel.encode($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pq_assign(s, sub)` → argmin centroid index of the dsub-slice against
  * subspace s — the training loop's assignment step. */
case class PqAssignExpr(left: Expression, right: Expression,
                        centroids: Array[Array[Array[Double]]])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(IntegerType, ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_assign"
  override protected def nullSafeEval(s: Any, sub: Any): Any =
    PqKernel.assignSub(s.asInstanceOf[Int], sub.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCentroids", centroids, "double[][][]")
    defineCodeGen(ctx, ev, (s, a) => s"graft.ext.PqKernel.assignSub($s, $a, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `pq_min_dist(s, sub)` → the subspace slice's quantization error (the
  * argmin centroid's own distance). Same frame contract as
  * [[PqAssignExpr]]. */
case class PqMinDistExpr(left: Expression, right: Expression,
                         centroids: Array[Array[Array[Double]]])
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(IntegerType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_min_dist"
  override protected def nullSafeEval(s: Any, sub: Any): Any =
    PqKernel.minDistSub(s.asInstanceOf[Int], sub.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCentroids", centroids, "double[][][]")
    defineCodeGen(ctx, ev, (s, a) => s"graft.ext.PqKernel.minDistSub($s, $a, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The MaxSim (late-interaction) kernel — ColBERT's scoring (Khattab &
  * Zaharia, SIGIR 2020): a document is a SET of token vectors, the
  * score against a query token set is Σ_t max_d ⟨q_t, d_d⟩ — each
  * query token reads its best-matching document token, summed in query-
  * token order (left-associated; the max itself is order-free). NULLs
  * and dimension mismatches refuse loudly. */
object MaxSimKernel {
  def score(mv: ArrayData, q: Array[Array[Double]]): Double = {
    val nd = mv.numElements()
    if (nd == 0)
      throw new IllegalArgumentException("maxsim: empty document token set")
    var total = 0.0
    var t = 0
    while (t < q.length) {
      val qt = q(t)
      var best = Double.NegativeInfinity
      var d = 0
      while (d < nd) {
        if (mv.isNullAt(d))
          throw new IllegalArgumentException(s"maxsim: NULL doc token at $d")
        val dv = mv.getArray(d)
        if (dv.numElements() != qt.length)
          throw new IllegalArgumentException(
            s"maxsim: doc token dim ${dv.numElements()} != query dim ${qt.length}")
        var dot = 0.0
        var i = 0
        while (i < qt.length) {
          if (dv.isNullAt(i))
            throw new IllegalArgumentException(
              s"maxsim: NULL element in doc token $d at $i")
          dot += dv.getDouble(i) * qt(i)
          i += 1
        }
        if (dot > best) best = dot
        d += 1
      }
      total += best
      t += 1
    }
    total
  }
}

/** `maxsim(multiVec)` → late-interaction score of a doc token set
  * against ONE query token set riding `addReferenceObj`. */
case class MaxSimExpr(child: Expression, query: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "maxsim"
  override protected def nullSafeEval(mv: Any): Any =
    MaxSimKernel.score(mv.asInstanceOf[ArrayData], query)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("maxsimQuery", query, "double[][]")
    defineCodeGen(ctx, ev, mv => s"graft.ext.MaxSimKernel.score($mv, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pq_adc(code)` → asymmetric distance via the driver-precomputed
  * per-subspace distance table of ONE query vector. */
case class PqAdcExpr(child: Expression, table: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  override protected def nullSafeEval(code: Any): Any =
    PqKernel.adc(code.asInstanceOf[ArrayData], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", table, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.ext.PqKernel.adc($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pq_adc_multi(code)` → per-query asymmetric distances (array, one per
  * stacked query table) — the batch-search projection. */
case class PqAdcMultiExpr(child: Expression, tables: Array[Array[Array[Double]]])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_multi"
  override protected def nullSafeEval(code: Any): Any =
    PqKernel.adcMulti(code.asInstanceOf[ArrayData], tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTables", tables, "double[][][]")
    defineCodeGen(ctx, ev, a => s"graft.ext.PqKernel.adcMulti($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column builders for the PQ expressions (registry-bypassing: the
  * codebook is a driver object, not a SQL literal). */
object PqFunctions {
  def pq_encode(vec: Column, centroids: Array[Array[Array[Double]]]): Column =
    Bridge.column(
      PqEncodeExpr(Bridge.expression(vec), centroids))
  def pq_assign(s: Column, sub: Column,
                centroids: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqAssignExpr(
      Bridge.expression(s), Bridge.expression(sub), centroids))
  def pq_adc(code: Column, table: Array[Array[Double]]): Column =
    Bridge.column(
      PqAdcExpr(Bridge.expression(code), table))
  def pq_adc_multi(code: Column, tables: Array[Array[Array[Double]]]): Column =
    Bridge.column(
      PqAdcMultiExpr(Bridge.expression(code), tables))
  def pq_min_dist(s: Column, sub: Column,
                  centroids: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqMinDistExpr(
      Bridge.expression(s), Bridge.expression(sub), centroids))
  def maxsim(multiVec: Column, query: Array[Array[Double]]): Column =
    Bridge.column(MaxSimExpr(Bridge.expression(multiVec), query))
}
