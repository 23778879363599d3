package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, DecimalType, DoubleType, LongType}

/**
 * The decimal-moment runtime kernel behind [[Pca]]'s one-pass moment
 * frame. Spark's wide-decimal SUM (precision > 18) runs on boxed
 * BigDecimals in the aggregation buffer — measured 6× the whole rest of
 * the moment pass. These two expressions keep the EXACT same decimal
 * totals while the aggregation itself runs on plain `long` columns:
 *
 *  - [[MomentUnscaledExpr]] converts each double to scale 12 by the
 *    PINNED rule `floor(d * 1e12 + 0.5)` (IEEE-replayable on every
 *    engine — see [[MomentKernel.unscaled12]] for why no native
 *    double→decimal cast is portable at its tie boundaries;
 *    NaN/±Inf → NULL) and returns the UNSCALED long;
 *  - the unscaled value splits into three 22-bit limbs with plain
 *    column bit-ops (arithmetic shift = floor division for powers of
 *    two, so negatives are exact), each limb sums as a vectorized
 *    `long`;
 *  - [[MomentLimbsToDecimalExpr]] recombines the three limb sums into
 *    the DECIMAL(38,12) total in one static call — BigInteger
 *    arithmetic, no Spark decimal multiply/divide (whose
 *    precision-loss rules would round a 12-scale recombination).
 *
 * Exactness bounds, stated loudly: per-value |x_i·x_j| must stay under
 * 10^6 (unscaled beyond ~9·10^18 cannot ride a long — refused, not
 * nulled); per-group row count under 2^41 (~2.2 trillion vectors) keeps
 * every limb sum inside a long. Both bounds hold with orders of
 * magnitude to spare for embedding-valued data at 100 TB.
 */
object MomentKernel {

  /** PINNED double→scale-12 conversion: round-half-toward-+∞ on the
    * IEEE double product — `floor(d * 1e12 + 0.5)` — returning the
    * unscaled long. Deliberately NOT any engine's native
    * double→decimal cast: cast boundary behavior is not portable
    * (measured on the real corpus — Spark's HALF_UP over the
    * shortest-repr BigDecimal and DuckDB's cast disagree on
    * 0.1983642578125 = 1625/2^13, a float whose decimal expansion
    * terminates EXACTLY at digit 13 = 5; float-valued inputs are
    * dyadic rationals, so such ties are common, and one flipped
    * 1e-12 fails an exact-sum gate). Multiply, add and floor are
    * IEEE-exactly-rounded everywhere, so BOTH engines replay this
    * rule bit-for-bit on every input. NaN/±Inf → NULL (the old
    * cast's contract, kept). Boxed so the NULL survives codegen. */
  def unscaled12(d: Double): java.lang.Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
    else {
      val p = Math.floor(d * 1e12 + 0.5)
      if (p < -9.2e18 || p > 9.2e18)
        throw new IllegalArgumentException(
          s"moment kernel: |$d| too large for the scale-12 long fast " +
            "path (needs |value| < ~9e6 squared) — moments of " +
            "unnormalized features this large need the decimal path")
      java.lang.Long.valueOf(p.toLong)
    }
  }

  /** Exact recombination: (hi·2^44 + mid·2^22 + lo)·10^-12. */
  def limbsToDecimal(hi: Long, mid: Long, lo: Long): org.apache.spark.sql.types.Decimal = {
    val u = java.math.BigInteger.valueOf(hi).shiftLeft(44)
      .add(java.math.BigInteger.valueOf(mid).shiftLeft(22))
      .add(java.math.BigInteger.valueOf(lo))
    org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(u, 12), 38, 12)
  }
}

/** `moment_unscaled(d)` → unscaled long of CAST(d AS DECIMAL(38,12));
  * NULL for NaN/±Inf (the cast's non-ansi contract). */
case class MomentUnscaledExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "moment_unscaled"
  override protected def nullSafeEval(d: Any): Any =
    MomentKernel.unscaled12(d.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, d => {
      val boxed = ctx.freshName("boxed")
      s"""
        java.lang.Long $boxed = graft.ext.MomentKernel.unscaled12($d);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.longValue(); }
      """
    })
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `moment_limbs_dec(hiSum, midSum, loSum)` → the exact DECIMAL(38,12)
  * total. */
case class MomentLimbsToDecimalExpr(first: Expression, second: Expression,
                                    third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = DecimalType(38, 12)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "moment_limbs_dec"
  override protected def nullSafeEval(h: Any, m: Any, l: Any): Any =
    MomentKernel.limbsToDecimal(h.asInstanceOf[Long], m.asInstanceOf[Long],
      l.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, m, l) =>
      s"graft.ext.MomentKernel.limbsToDecimal($h, $m, $l)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

object MomentFunctions {
  def moment_unscaled(d: Column): Column =
    Bridge.column(MomentUnscaledExpr(Bridge.expression(d)))
  def moment_limbs_dec(hi: Column, mid: Column, lo: Column): Column =
    Bridge.column(MomentLimbsToDecimalExpr(Bridge.expression(hi),
      Bridge.expression(mid), Bridge.expression(lo)))
}
