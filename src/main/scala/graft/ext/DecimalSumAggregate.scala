package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType}

/**
 * Exact fixed-scale decimal SUM over a double column on a plain `long`
 * accumulator — the [[MomentKernel]] fix generalized into one reusable
 * aggregate. Spark's wide-decimal SUM (precision > 18) runs on boxed
 * BigDecimals in the aggregation buffer; measured on the q161 range
 * join it was ~90% of the gate's honest cost (85 s, of which the join
 * itself is a few seconds). This aggregate converts each value once by
 * the PINNED cross-engine rule `floor(x · 10^scale + 0.5)` (see
 * [[MomentKernel.unscaled12]] for why no native double→decimal cast is
 * portable at its tie boundaries) and accumulates unscaled `long`s —
 * exact, order-free, and `Math.addExact`-guarded: overflow REFUSES
 * loudly instead of wrapping (sum magnitude must stay under ~9.2e18 /
 * 10^scale; at scale 6 that is ~9.2e12 — raise by summing partitions
 * separately if a corpus ever exceeds it). NULL inputs are skipped and
 * an all-NULL/empty group yields NULL — SUM's exact semantics.
 */
object DecimalSums {
  /** `exact_decimal_sum(e)` at `scale` — returns DECIMAL(38, scale).
    * NOTE: a [[TypedImperativeAggregate]] plans as ObjectHashAggregate,
    * which falls back to SORT-based aggregation past
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) distinct keys per partition — fine for global or
    * low-cardinality sums; for many groups use [[groupSumExact]],
    * whose plain long SUMs stay in whole-stage codegen. */
  def exactDecimalSum(e: Column, scale: Int): Column =
    Bridge.column(ExactDecimalSum(Bridge.expression(e), scale)
      .toAggregateExpression())

  /**
   * Exact decimal(38, scale) group SUM of a double column via
   * LIMB-DECOMPOSED plain `long` sums — the [[MomentKernel]] shape as
   * a reusable groupBy: each value converts once by the pinned
   * `floor(x·10^scale + 0.5)` rule (NaN/±Inf and magnitudes past the
   * long fast path REFUSED loudly; a silent wrap would corrupt the
   * sum), splits into three 22-bit limbs with plain column bit-ops
   * (arithmetic shift = floor division, negatives exact), each limb
   * sums as a vectorized codegen'd `long` (provably exact below 2^41
   * rows per group — a per-group row count REFUSES loudly past the
   * bound instead of letting the plain sums wrap), and one per-group
   * expression recombines the exact
   * DECIMAL(38, scale) total. Vs Spark's boxed wide-decimal SUM:
   * measured 85 s → ~8 s on the q161 range join's ~10M-row aggregate.
   * NULL values skip; an all-NULL/empty group yields NULL (SUM
   * semantics).
   */
  def groupSumExact(df: org.apache.spark.sql.DataFrame,
                    groupCols: Seq[Column], value: Column, scale: Int,
                    outName: String,
                    extraAggs: Seq[Column] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val staged = limbStaged(df, value, scale)
    val aggList = extraAggs ++ Seq(
      sum(col("_ds_h")).as("_ds_sh"),
      sum(col("_ds_m")).as("_ds_sm"),
      sum(col("_ds_l")).as("_ds_sl"),
      count(lit(1)).as("_ds_n"))
    // Overflow guard for the limb path: the low/mid limbs are < 2^22
    // per row, the high limb < 2^19, so their plain long SUMs are
    // provably exact below 2^41 rows per group — past that they could
    // wrap SILENTLY (the codegen'd SUM has no addExact). A per-group
    // row count is one cheap extra long aggregate and turns the
    // documented bound into a loud refusal, keeping the module's
    // "overflow refuses instead of wrapping" claim true on BOTH paths
    // (the refusal itself lives in [[limbFinish]]).
    limbFinish(staged.groupBy(groupCols: _*)
      .agg(aggList.head, aggList.tail: _*), outName, scale)
  }

  /** The [[groupSumExact]] staging pass, shared with the fused
    * range-aggregate ([[RangeJoin.pointInIntervalSumExact]]): converts
    * `value` once by the pinned `floor(x·10^scale + 0.5)` rule (NaN /
    * overscale magnitudes refused loudly) and appends the three 22-bit
    * limb columns `_ds_h`/`_ds_m`/`_ds_l` (plus the raw `_ds_u`).
    * Plain long sums of these limbs are exact below 2^41 rows and
    * FULLY reassociable — any regrouping of partial limb sums
    * recombines to the identical decimal, which is what licenses
    * pre-aggregation rewrites upstream of the final group. */
  private[ext] def limbStaged(df: org.apache.spark.sql.DataFrame,
                              value: Column, scale: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(scale >= 0 && scale <= 12, s"scale in [0, 12], got $scale")
    val factor = math.pow(10.0, scale)
    val guarded = when(isnan(value),
        raise_error(lit("groupSumExact: NaN input — an exact decimal " +
          "sum of non-finite values is undefined")).cast("double"))
      .when(abs(value) * lit(factor) > lit(9.2e18),
        raise_error(concat(lit("groupSumExact: |"), value.cast("string"),
          lit(s"| too large for the scale-$scale long fast path")))
          .cast("double"))
      .otherwise(value)
    val u = floor(guarded * lit(factor) + lit(0.5)).cast("long")
    val mask = lit((1L << 22) - 1)
    df.withColumn("_ds_u", u)
      .withColumn("_ds_h", shiftright(col("_ds_u"), 44))
      .withColumn("_ds_m", shiftright(col("_ds_u"), 22).bitwiseAND(mask))
      .withColumn("_ds_l", col("_ds_u").bitwiseAND(mask))
  }

  /** The [[groupSumExact]] finishing pass over already-summed limb
    * columns `_ds_sh`/`_ds_sm`/`_ds_sl` + row count `_ds_n`: appends
    * the recombined DECIMAL(38, scale) as `outName` (with the 2^41
    * exactness-bound refusal) and drops the internals. */
  private[ext] def limbFinish(grouped: org.apache.spark.sql.DataFrame,
                              outName: String, scale: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val safeRows = 1L << 41
    val recombined = Bridge.column(LimbsToDecimalAtExpr(
      Bridge.expression(col("_ds_sh")), Bridge.expression(col("_ds_sm")),
      Bridge.expression(col("_ds_sl")), scale))
    grouped.withColumn(outName,
        when(col("_ds_n") > lit(safeRows),
          raise_error(concat(lit("groupSumExact: group exceeds 2^41 rows "),
            lit("— the 22-bit limb long sums are only provably exact "),
            lit("below that; pre-aggregate in sub-groups and combine")))
            .cast(s"decimal(38,$scale)"))
        .otherwise(recombined))
      .drop("_ds_sh", "_ds_sm", "_ds_sl", "_ds_n")
  }

  /** Exact recombination at `scale`: (hi·2^44 + mid·2^22 + lo)·10^-scale. */
  def limbsToDecimalAt(hi: Long, mid: Long, lo: Long,
                       scale: Int): Decimal = {
    val u = java.math.BigInteger.valueOf(hi).shiftLeft(44)
      .add(java.math.BigInteger.valueOf(mid).shiftLeft(22))
      .add(java.math.BigInteger.valueOf(lo))
    Decimal(new java.math.BigDecimal(u, scale), 38, scale)
  }
}

/** `limbs_to_decimal_at(hiSum, midSum, loSum)` → DECIMAL(38, scale). */
case class LimbsToDecimalAtExpr(first: Expression, second: Expression,
                                third: Expression, scale: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = DecimalType(38, scale)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "limbs_to_decimal_at"
  override protected def nullSafeEval(h: Any, m: Any, l: Any): Any =
    DecimalSums.limbsToDecimalAt(h.asInstanceOf[Long], m.asInstanceOf[Long],
      l.asInstanceOf[Long], scale)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (h, m, l) =>
      s"graft.ext.DecimalSums.limbsToDecimalAt($h, $m, $l, $scale)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** Accumulator: unscaled sum + seen-any flag (SUM's NULL-on-empty). */
final class DecSumBuffer(var sum: Long, var seen: Boolean)

case class ExactDecimalSum(child: Expression, scale: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DecSumBuffer]
    with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(scale >= 0 && scale <= 12,
    s"exact_decimal_sum: scale in [0, 12], got $scale")
  private val factor = math.pow(10.0, scale)

  override def dataType: DataType = DecimalType(38, scale)
  override def nullable: Boolean = true
  override def prettyName: String = "exact_decimal_sum"
  override def createAggregationBuffer(): DecSumBuffer =
    new DecSumBuffer(0L, false)

  override def update(buf: DecSumBuffer, input: InternalRow): DecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
        throw new IllegalArgumentException(
          "exact_decimal_sum: NaN/Infinity input — an exact decimal sum " +
            "of non-finite values is undefined; filter or fix upstream")
      val p = Math.floor(d * factor + 0.5)
      if (p < -9.2e18 || p > 9.2e18)
        throw new IllegalArgumentException(
          s"exact_decimal_sum: |$d| too large for the scale-$scale long " +
            "accumulator — sum partitions separately or reduce the scale")
      buf.sum = Math.addExact(buf.sum, p.toLong)
      buf.seen = true
    }
    buf
  }

  override def merge(a: DecSumBuffer, b: DecSumBuffer): DecSumBuffer = {
    a.sum = Math.addExact(a.sum, b.sum)
    a.seen = a.seen || b.seen
    a
  }

  override def eval(buf: DecSumBuffer): Any =
    if (!buf.seen) null
    else Decimal(new java.math.BigDecimal(
      java.math.BigInteger.valueOf(buf.sum), scale), 38, scale)

  override def serialize(buf: DecSumBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(9)
    bb.putLong(buf.sum).put(if (buf.seen) 1.toByte else 0.toByte)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): DecSumBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new DecSumBuffer(bb.getLong(), bb.get() == 1.toByte)
  }

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType)
  override def withNewMutableAggBufferOffset(o: Int): ExactDecimalSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactDecimalSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ExactDecimalSum =
    copy(child = c)
}
