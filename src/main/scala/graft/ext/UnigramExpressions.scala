package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unigram-LM (SentencePiece-family) ENCODE kernel — the apply side of
 * [[TextAnalysis.unigramTrain]]: per word, the max-probability Viterbi
 * segmentation under the trained piece table, bit-compatible with the
 * training DP (round-6 log-probabilities, identical left-to-right
 * score accumulation, ties to the LONGEST piece via ascending start
 * position and strict `>`). The vocabulary snapshot rides
 * `ctx.addReferenceObj` (the [[PqKernel]] pattern), so generated code
 * is ONE static call regardless of vocabulary size.
 *
 * Unknown characters are REFUSED loudly: training's single-char floor
 * guarantees coverage of the training corpus, so an unsegmentable
 * word means the caller is encoding with the wrong vocabulary —
 * silently emitting <unk> would corrupt every downstream count.
 */
object UnigramKernel {

  /** Driver-built vocabulary snapshot: piece → round-6 log-probability
    * (ln n − ln Σn, HALF_UP at 6 decimals — the training pin). */
  final class Vocab(val lp: java.util.HashMap[String, java.lang.Double],
                    val maxPieceLen: Int) extends Serializable

  def build(pieces: Array[(String, Long)], maxPieceLen: Int): Vocab = {
    require(pieces.nonEmpty, "unigram encode: empty piece table")
    require(maxPieceLen >= 1, s"maxPieceLen >= 1, got $maxPieceLen")
    pieces.foreach { case (p, n) =>
      require(p != null && p.nonEmpty && n >= 1,
        s"unigram encode: invalid piece ('$p', $n)")
      require(p.length <= maxPieceLen,
        s"unigram encode: piece '$p' longer than maxPieceLen=$maxPieceLen")
    }
    require(pieces.map(_._1).distinct.length == pieces.length,
      "unigram encode: duplicate pieces in table")
    val total = pieces.map(_._2).sum.toDouble
    val m = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    pieces.foreach { case (p, n) =>
      m.put(p, java.math.BigDecimal
        .valueOf(math.log(n.toDouble) - math.log(total))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    new Vocab(m, maxPieceLen)
  }

  /** Viterbi segmentation of one word; empty input → empty array. */
  def segment(word: UTF8String, vocab: Vocab): GenericArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - vocab.maxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val lpv = vocab.lp.get(w.substring(j, i))
          if (lpv != null) {
            val sc = best(j) + lpv
            // strict >: the FIRST candidate (smallest j = longest
            // piece) keeps ties — the training DP's rule
            if (sc > best(i)) { best(i) = sc; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    if (back(n) < 0)
      throw new IllegalArgumentException(
        s"unigram_segment: word '$w' is unsegmentable under this " +
          "vocabulary (a character is missing) — encode with the " +
          "vocabulary trained on this corpus, or extend the piece table")
    var parts = List.empty[Any]
    var end = n
    while (end > 0) {
      val start = back(end)
      parts = UTF8String.fromString(w.substring(start, end)) :: parts
      end = start
    }
    new GenericArrayData(parts.toArray)
  }
}

/** `unigram_segment(word)` → array<string> pieces. The vocab rides as a
  * constructor field (reference equality — two nodes from different
  * trained models never compare equal, the [[PqEncodeExpr]] contract). */
case class UnigramSegmentExpr(child: Expression, vocab: UnigramKernel.Vocab)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_segment"
  override protected def nullSafeEval(v: Any): Any =
    UnigramKernel.segment(v.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", vocab,
      classOf[UnigramKernel.Vocab].getName)
    defineCodeGen(ctx, ev, a => s"graft.ext.UnigramKernel.segment($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
