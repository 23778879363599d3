package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampType}

/**
 * Broadcast-dimension snapshot for the STREAM-STATIC as-of lookup
 * ([[graft.streaming.EventStream.asofLookup]]): per-key sorted
 * timestamp slices over one flat array, shipped to executors via
 * `ctx.addReferenceObj` — the PqKernel/StTransform snapshot pattern.
 * The batch [[AsOf.asofJoin]]'s union-window needs a full per-key sort
 * and therefore cannot run on an unbounded stream; a per-row binary
 * search against a broadcast snapshot is the stateless formulation
 * Structured Streaming can execute (kdb's in-memory `aj` against a
 * static quote table, Flink's temporal table function with a bounded
 * build side).
 *
 * `slots` maps key → slice id (StringType keys stored as `UTF8String`
 * — the runtime value the expression sees); `ts(starts(s) until
 * ends(s))` is that key's ascending timestamp array (micros for
 * timestamp axes, raw units for numeric axes). `tolerance` < 0 = none;
 * on a micros axis it is SECONDS compared on floor-div truncated
 * seconds — bit-for-bit the batch asofJoin's `cast(ts as long)`
 * convention, so streaming ≡ batch is exact, not approximate.
 */
final class AsofSnapshot(
    val slots: java.util.HashMap[AnyRef, Integer],
    val starts: Array[Int],
    val ends: Array[Int],
    val ts: Array[Long],
    val microsAxis: Boolean,
    val tolerance: Long) extends Serializable

object AsofKernel {

  /** Global index of the LATEST dim row at-or-before `t` within `key`'s
    * slice, tolerance-checked; -1 = no match (unknown key, all dims
    * after `t`, or outside tolerance). Rightmost-`<=` binary search —
    * the backward as-of convention, exact matches included. */
  def lookup(snap: AsofSnapshot, key: AnyRef, t: Long): Int = {
    val slot = snap.slots.get(key)
    if (slot == null) return -1
    var lo = snap.starts(slot.intValue())
    val end = snap.ends(slot.intValue())
    var hi = end - 1
    if (lo > hi || snap.ts(lo) > t) return -1
    // invariant: ts(lo) <= t; shrink to the rightmost such index
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (snap.ts(mid) <= t) lo = mid else hi = mid - 1
    }
    if (snap.tolerance >= 0) {
      val gap =
        if (snap.microsAxis)
          Math.floorDiv(t, 1000000L) - Math.floorDiv(snap.ts(lo), 1000000L)
        else t - snap.ts(lo)
      if (gap > snap.tolerance) return -1
    }
    lo
  }
}

/** `asof_index(key, ts)` → the broadcast dimension's matching row index
  * (NULL = no match). The snapshot rides as a constructor field so two
  * nodes built from different dimensions compare unequal (reference
  * equality — conservative, never wrongly equal, the PqEncodeExpr
  * rationale). */
case class AsofIndexExpr(left: Expression, right: Expression,
                         snap: AsofSnapshot)
    extends BinaryExpression {
  // an analysis-time check, NOT a constructor require: Catalyst rules
  // copy expressions with intermediate children (e.g. null literals)
  // and a constructor assertion would fire on those transients
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (right.dataType == TimestampType || right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"asof_index: ts must be TIMESTAMP or BIGINT, got ${right.dataType}")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "asof_index"
  override protected def nullSafeEval(k: Any, t: Any): Any = {
    val idx = AsofKernel.lookup(snap, k.asInstanceOf[AnyRef],
      t.asInstanceOf[Long])
    if (idx < 0) null else idx
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("asofSnap", snap, "graft.ext.AsofSnapshot")
    val idx = ctx.freshName("asofIdx")
    nullSafeCodeGen(ctx, ev, (k, t) => {
      s"""
         |int $idx = graft.ext.AsofKernel.lookup($ref, $k, (long)$t);
         |if ($idx < 0) { ${ev.isNull} = true; } else { ${ev.value} = $idx; }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object AsofFunctions {
  def asof_index(key: Column, ts: Column, snap: AsofSnapshot): Column =
    Bridge.column(AsofIndexExpr(
      Bridge.expression(key), Bridge.expression(ts), snap))
}
