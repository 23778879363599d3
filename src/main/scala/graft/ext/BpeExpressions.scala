package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * BPE ENCODE kernel — the apply side of [[TextAnalysis.bpeTrainMerges]]
 * for a SAVED merge table: replays the trained merges over a word in
 * rank order, each round a leftmost-first non-overlapping pass,
 * bit-compatible with the training loop's accumulated-last-symbol fold
 * (a symbol written by a merge is `a+b`, which never equals `a`, so
 * merged output cannot chain-merge within a round — the same rule the
 * trainer pins). The merge list rides `ctx.addReferenceObj` (the
 * [[PqKernel]]/[[UnigramKernel]] pattern), so generated code is ONE
 * static call regardless of merge count.
 *
 * Deliberately SEQUENTIAL (round-by-round), not the iterative
 * lowest-rank-pair encode some tokenizers use: the two diverge when a
 * later merge manufactures a symbol string that an earlier-rank pair
 * wants (rank inversion), and the training artifact's semantics are the
 * sequential ones. Cost is O(rounds × len) per DISTINCT word in the
 * worst case, but each round first checks `word.contains(a+b)` — the
 * pair can only be adjacent if its concatenation is a substring of the
 * word — so non-applicable rounds cost one indexOf.
 */
object BpeKernel {

  /** Driver-built merge snapshot: (left, right) in rank order, plus the
    * concatenations for the substring fast-path. */
  final class Merges(val left: Array[String], val right: Array[String],
                     val joined: Array[String]) extends Serializable

  def build(pairs: Array[(String, String)]): Merges = {
    pairs.foreach { case (a, b) =>
      require(a != null && b != null && a.nonEmpty && b.nonEmpty,
        s"bpe encode: invalid merge pair ('$a', '$b')")
    }
    new Merges(pairs.map(_._1), pairs.map(_._2), pairs.map(p => p._1 + p._2))
  }

  /** Initial symbols: one per CODE POINT — the trainer's `split(w, "")`. */
  private def codePoints(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out(k) = w.substring(i, i + n)
      i += n
      k += 1
    }
    out
  }

  /** Replay all merges over one word; empty input → empty array. */
  def segment(word: UTF8String, m: Merges): GenericArrayData = {
    val w = word.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    var syms = codePoints(w)
    var r = 0
    while (r < m.left.length && syms.length > 1) {
      if (w.contains(m.joined(r))) {
        val a = m.left(r)
        val b = m.right(r)
        val out = new Array[String](syms.length)
        var i = 0
        var k = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out(k) = m.joined(r); i += 2
          } else { out(k) = syms(i); i += 1 }
          k += 1
        }
        if (k < syms.length) syms = java.util.Arrays.copyOf(out, k)
        else syms = out
      }
      r += 1
    }
    new GenericArrayData(
      syms.map(s => UTF8String.fromString(s): Any))
  }
}

/** `bpe_segment(word)` → array<string> subwords under the loaded merge
  * table. Merges ride as a constructor field (reference equality — two
  * nodes from different artifacts never compare equal). */
case class BpeSegmentExpr(child: Expression, merges: BpeKernel.Merges)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_segment"
  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.segment(v.asInstanceOf[UTF8String], merges)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges,
      classOf[BpeKernel.Merges].getName)
    defineCodeGen(ctx, ev, a => s"graft.ext.BpeKernel.segment($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
