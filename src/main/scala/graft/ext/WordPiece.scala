package graft.ext

import graft.core.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer
 * family) — the third tokenizer family next to BPE
 * ([[TextAnalysis.bpeTrainMerges]]) and unigram-LM
 * ([[TextAnalysis.unigramTrainPieces]]). Two halves, deliberately
 * asymmetric like the real thing:
 *
 *  - TRAINING is merge-based like BPE, but the argmax is the
 *    LIKELIHOOD score `n(ab) / (n(a) * n(b))` over the current round's
 *    segmentation — pair count normalized by both symbols' unigram
 *    counts — instead of the raw pair count. Symbols carry the `##`
 *    continuation prefix (word-initial symbols bare, all others
 *    `##`-prefixed); merging `(a, ##b)` spells `a + b` and inherits
 *    `a`'s prefix status, so continuation-ness is positional and
 *    survives every merge.
 *  - ENCODING is greedy longest-match-first against the final VOCAB
 *    (alphabet-as-seen plus every merged token), NOT a replay of the
 *    merge list: a training word can encode differently from its own
 *    training segmentation, exactly as in BERT's tokenizer. A word
 *    with any unmatchable position becomes one `[UNK]` whole-word
 *    token (the HF convention).
 *
 * Score comparisons are IEEE doubles computed identically on every
 * path (`n.toDouble / (na.toDouble * nb.toDouble)` — division and
 * multiplication are exactly-rounded, so JVM and C engines agree
 * bit-for-bit); genuine ties break on the space-joined pair string
 * ascending in UTF-8 byte order, the same collation
 * [[TextAnalysis.bpeTrainMerges]] pins.
 *
 * The `##` sentinel makes words containing a literal `#` ambiguous
 * (the same ambiguity BERT's vocab files carry); this implementation
 * REFUSES them loudly rather than silently mis-segmenting.
 *
 * Scale: identical to the BPE trainer's shape — ONE corpus-scale
 * word-count aggregate, then the merge loop runs over the
 * Zipf-small distinct-word vocab, driver-local when it fits under
 * `maxLocalVocab` (the common case) with a distributed per-round
 * fallback behind a loud warning. Encoding never re-segments per
 * occurrence: the kernel runs once per DISTINCT word and the corpus
 * joins the slim (word, counts) frame, AQE-broadcast when it fits.
 */
object WordPiece {

  /** Initial WordPiece segmentation of a word: first code point bare,
    * every later one `##`-prefixed. Refuses literal `#` (sentinel
    * collision — see class doc). */
  private def initialSyms(w: String): Array[String] = {
    require(!w.contains("#"),
      s"wordpiece: word '$w' contains '#' — the '##' continuation " +
      "sentinel would be ambiguous; strip or remap '#' upstream")
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out(k) = if (k == 0) w.substring(i, i + n) else "##" + w.substring(i, i + n)
      i += n
      k += 1
    }
    out
  }

  /** Merged spelling of an adjacent pair: right side is ALWAYS a
    * continuation (only position 0 is bare and merges preserve that),
    * so strip its `##` and keep the left's prefix status. */
  private def mergedSym(a: String, b: String): String = {
    require(b.startsWith("##"),
      s"wordpiece: right merge operand '$b' is not a continuation " +
      "symbol — segmentation invariant broken")
    a + b.substring(2)
  }

  /** UTF-8 byte-order less-than — Spark's string collation, pinned for
    * the local/distributed tie-order equivalence (same contract as the
    * BPE trainer's). */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** One merge round's record: rank, pair "a b", pair count, and both
    * symbol counts (the score's exact integer inputs — the gate pins
    * these, never the float). */
  final case class Merge(round: Int, pair: String, n: Long, na: Long, nb: Long)

  /** Driver-local merge loop over the collected (word, syms, count)
    * vocab — the [[TextAnalysis]] BPE local-loop shape with the
    * likelihood argmax. Mutates `words` in place. */
  private def trainLocal(words: Array[(String, Array[String], Long)],
                         rounds: Int): Seq[Merge] = {
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairCounts = new java.util.HashMap[(String, String), java.lang.Long]()
      val symCounts = new java.util.HashMap[String, java.lang.Long]()
      words.foreach { case (_, syms, wc) =>
        var i = 0
        while (i < syms.length) {
          symCounts.merge(syms(i), wc, (x, y) => java.lang.Long.valueOf(x + y))
          if (i < syms.length - 1)
            pairCounts.merge((syms(i), syms(i + 1)), wc,
              (x, y) => java.lang.Long.valueOf(x + y))
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        var bestA: String = null; var bestB: String = null
        var bestPair: String = null
        var bestScore = Double.NegativeInfinity
        var bestN = 0L; var bestNa = 0L; var bestNb = 0L
        pairCounts.forEach { (k, v) =>
          val na = symCounts.get(k._1).longValue()
          val nb = symCounts.get(k._2).longValue()
          // IEEE double division/multiplication — bit-identical to the
          // distributed path's and the oracle's CAST-to-double formula
          val score = v.toDouble / (na.toDouble * nb.toDouble)
          val pair = k._1 + " " + k._2
          if (score > bestScore ||
              (score == bestScore && utf8Less(pair, bestPair))) {
            bestA = k._1; bestB = k._2; bestPair = pair
            bestScore = score; bestN = v; bestNa = na; bestNb = nb
          }
        }
        merges += Merge(r, bestPair, bestN, bestNa, bestNb)
        val ab = mergedSym(bestA, bestB)
        var i = 0
        while (i < words.length) {
          val (w, syms, wc) = words(i)
          var j = 0; var hit = false
          while (j < syms.length - 1 && !hit) {
            hit = syms(j) == bestA && syms(j + 1) == bestB; j += 1
          }
          if (hit) words(i) = (w, mergeWordLocal(syms, bestA, bestB, ab), wc)
          i += 1
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Leftmost-first non-overlapping merge application — compare the
    * ACCUMULATED last symbol to `a` so a just-written `a+b` never
    * chain-merges within the round (the BPE trainer's fold rule). */
  private def mergeWordLocal(syms: Array[String], a: String, b: String,
                             ab: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    out += syms(0)
    var i = 1
    while (i < syms.length) {
      if (out(out.length - 1) == a && syms(i) == b) out(out.length - 1) = ab
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Initial segmentation as a plan expression: split to code points
    * (Spark's `split(w, "")`), first bare, rest `##`-prefixed. The
    * `#`-refusal rides INSIDE the expression (a separate guard column
    * would be pruned away unevaluated): any word containing `#` fails
    * the job loudly instead of mis-segmenting. */
  private def initialSymsCol(w: Column): Column = {
    val cps = split(w, "")
    when(w.contains("#"),
      raise_error(concat(lit("wordpiece: word '"), w,
        lit("' contains '#' — the '##' continuation sentinel would be " +
          "ambiguous; strip or remap '#' upstream")))
        .cast(ArrayType(StringType, containsNull = false)))
      .otherwise(concat(slice(cps, lit(1), lit(1)),
        transform(slice(cps, lit(2), size(cps) - 1), c => concat(lit("##"), c))))
  }

  /** Train loop shared by [[trainMerges]] and [[segmentCounts]]:
    * (merge list, final-round segmentation frame (w, syms)). */
  private def trainLoop(df: DataFrame, textCol: String, rounds: Int,
                        maxLocalVocab: Int)
      : (Seq[Merge], DataFrame) = {
    require(rounds >= 1 && rounds <= 100000, s"rounds in [1, 100000], got $rounds")
    require(maxLocalVocab >= 0, s"maxLocalVocab must be >= 0, got $maxLocalVocab")
    val spark = df.sparkSession
    val vocab0 = df.select(explode(TextAnalysis.wordTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val head =
      if (maxLocalVocab == 0) Array.empty[org.apache.spark.sql.Row]
      else vocab0.limit(maxLocalVocab + 1).collect()
    if (head.nonEmpty && head.length <= maxLocalVocab) {
      import spark.implicits._
      val words = head.map(r =>
        (r.getString(0), initialSyms(r.getString(0)), r.getLong(1)))
      val merges = trainLocal(words, rounds)
      val seg = words.toSeq.map { case (w, syms, _) => (w, syms.toSeq) }
        .toDF("w", "syms")
      return (merges, seg)
    }
    if (maxLocalVocab > 0)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"WordPiece.trainLoop: vocab exceeds maxLocalVocab=$maxLocalVocab " +
        "distinct words - falling back to the DISTRIBUTED per-round merge " +
        s"loop (one Spark job per round; at $rounds rounds expect launch " +
        "overhead to dominate). Raise maxLocalVocab if the driver can " +
        "hold the vocab.")
    var vocab = vocab0
      .select(col("w"), initialSymsCol(col("w")).as("syms"), col("wc"))
      .lineageCut()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val pairs = vocab.filter(size(col("syms")) >= 2)
        .select(col("wc"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p").getField("a").as("a"), col("p").getField("b").as("b"))
        .agg(sum(col("wc")).as("n"))
      val syms = vocab
        .select(col("wc"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum(col("wc")).as("ns"))
      val top = pairs
        .join(syms.select(col("s").as("a"), col("ns").as("na")), Seq("a"))
        .join(syms.select(col("s").as("b"), col("ns").as("nb")), Seq("b"))
        .withColumn("pair", concat(col("a"), lit(" "), col("b")))
        .withColumn("score", col("n").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")))
        .orderBy(col("score").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getAs[String]("a")
        val b = top(0).getAs[String]("b")
        merges += Merge(r, a + " " + b, top(0).getAs[Long]("n"),
          top(0).getAs[Long]("na"), top(0).getAs[Long]("nb"))
        val ab = mergedSym(a, b)
        vocab = vocab.select(col("w"),
          when(size(col("syms")) < 2, col("syms")).otherwise(
            aggregate(slice(col("syms"), lit(2), size(col("syms")) - 1),
              slice(col("syms"), lit(1), lit(1)),
              (acc, x) => when(
                element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(ab))))
                .otherwise(concat(acc, array(x))))).as("syms"),
          col("wc"))
          .lineageCut()
        r += 1
      }
    }
    (merges.result(), vocab.select(col("w"), col("syms")))
  }

  /** Train `rounds` WordPiece merges; returns the merge table
    * `(round, pair, n, na, nb)` — the ordered merge list plus the
    * score's exact integer inputs. */
  def trainMerges(df: DataFrame, textCol: String, rounds: Int,
                  maxLocalVocab: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    val (merges, _) = trainLoop(df, textCol, rounds, maxLocalVocab)
    import spark.implicits._
    merges.map(m => (m.round, m.pair, m.n, m.na, m.nb))
      .toDF("round", "pair", "n", "na", "nb")
  }

  /** Final vocab PIECES for the greedy encoder: the alphabet as seen
    * (word-initial code points bare, later ones `##`-prefixed) plus
    * every merged token. Driver-sized by construction: |alphabet| +
    * `rounds`. */
  private def vocabPiecesLocal(df: DataFrame, textCol: String,
                               merges: Seq[Merge],
                               maxAlphabet: Int): Array[String] = {
    val alphaRows = df
      .select(explode(TextAnalysis.wordTokens(col(textCol))).as("w"))
      .distinct()
      .select(explode(initialSymsCol(col("w"))).as("piece"))
      .distinct()
      .limit(maxAlphabet + 1).collect()
    require(alphaRows.length <= maxAlphabet,
      s"wordpiece: alphabet exceeds maxAlphabet=$maxAlphabet distinct " +
      "initial symbols — not a natural-language corpus? Raise the knob " +
      "if the driver can hold it.")
    val merged = merges.map { m =>
      val sp = m.pair.split(" ", 2)
      mergedSym(sp(0), sp(1))
    }
    (alphaRows.map(_.getString(0)) ++ merged).distinct.toArray
  }

  /**
   * Train + greedy-encode: per-document subword counts under the
   * trained vocab — `(idCol, n_subwords, n_unk)`. `[UNK]` counts as
   * one subword. Unlike [[TextAnalysis.bpeSegmentCounts]] this is NOT
   * a merge replay: encoding is longest-match-first against the vocab
   * (a training word can encode differently from its own training
   * segmentation — the BERT behavior, and the thing this gate
   * exercises).
   */
  def segmentCounts(df: DataFrame, textCol: String, idCol: String,
                    rounds: Int, maxLocalVocab: Int = 1000000,
                    maxAlphabet: Int = 1 << 20): DataFrame = {
    val (merges, _) = trainLoop(df, textCol, rounds, maxLocalVocab)
    val pieces = vocabPiecesLocal(df, textCol, merges, maxAlphabet)
    val kernel = WordPieceKernel.build(pieces)
    // encode once per DISTINCT word, then join the corpus's exploded
    // words on the slim (w, ns, nunk) frame — AQE broadcasts it when it
    // fits, the same shape as the BPE/unigram encodes
    val seg = df.select(explode(TextAnalysis.wordTokens(col(textCol))).as("w"))
      .distinct()
      .select(col("w"),
        encodeTokens(col("w"), kernel).as("pieces"))
      .select(col("w"), size(col("pieces")).cast("long").as("_ns"),
        size(filter(col("pieces"), p => p === lit(WordPieceKernel.Unk)))
          .cast("long").as("_nunk"))
    df.select(col(idCol), explode_outer(TextAnalysis.wordTokens(col(textCol))).as("w"))
      .join(seg, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("_ns")), lit(0L)).as("n_subwords"),
        coalesce(sum(col("_nunk")), lit(0L)).as("n_unk"))
  }

  /** `wordpiece_encode(word)` under a built kernel — array of pieces
    * (`[UNK]` for unmatchable words), codegen'd. */
  def encodeTokens(word: Column, kernel: WordPieceKernel.Vocab): Column =
    Bridge.column(WordPieceEncodeExpr(Bridge.expression(word), kernel))

  // ---- Artifact: save / load / encode-from-disk ---------------------------
  //
  // Train ONCE, encode DAILY — the q185 lifecycle for the third
  // family. The artifact is the ENCODE VOCAB (one `wp_piece` column:
  // alphabet-as-seen + merged tokens), deliberately schema-distinct
  // from the BPE merge table (round, pair, n) and the unigram piece
  // table (piece, n) so [[TextAnalysis.withSubwordCounts]] can
  // dispatch on columns alone.

  /** Train and return the encode vocab as a frame: `(wp_piece)`,
    * ordered for a stable artifact. */
  def vocabFrame(df: DataFrame, textCol: String, rounds: Int,
                 maxLocalVocab: Int = 1000000,
                 maxAlphabet: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    val (merges, _) = trainLoop(df, textCol, rounds, maxLocalVocab)
    val pieces = vocabPiecesLocal(df, textCol, merges, maxAlphabet)
    import spark.implicits._
    pieces.toSeq.sorted.toDF("wp_piece")
  }

  /** Persist a [[vocabFrame]] artifact. Overwrites — refreshing the
    * tokenizer artifact in place is the intended lifecycle. */
  def savePieces(vocab: DataFrame, path: String): Unit = {
    require(vocab.columns.contains("wp_piece"),
      s"WordPiece.savePieces: expected a wp_piece column, got " +
        vocab.columns.mkString(","))
    vocab.select("wp_piece").orderBy("wp_piece")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a saved vocab — bounded probe-collect, loud refusal past the
    * cap (the artifact is driver-sized by construction). */
  def loadPieces(spark: org.apache.spark.sql.SparkSession, path: String,
                 maxLocalVocab: Int = 2000000): Array[String] = {
    val df = spark.read.parquet(path)
    require(df.columns.contains("wp_piece"),
      s"WordPiece.loadPieces: $path is not a wordpiece vocab artifact " +
        s"(columns ${df.columns.mkString(",")})")
    val rows = df.select(col("wp_piece")).limit(maxLocalVocab + 1).collect()
    require(rows.length <= maxLocalVocab,
      s"WordPiece.loadPieces: artifact exceeds maxLocalVocab=" +
        s"$maxLocalVocab pieces — raise the cap if the driver can hold it")
    rows.map(_.getString(0))
  }

  /** ENCODE a corpus with a SAVED vocab — [[segmentCounts]] without
    * the training pass; identical greedy kernel, identical output. */
  def segmentCountsFrom(df: DataFrame, textCol: String, idCol: String,
                        vocabPath: String,
                        maxLocalVocab: Int = 2000000): DataFrame = {
    val pieces = loadPieces(df.sparkSession, vocabPath, maxLocalVocab)
    require(pieces.nonEmpty,
      s"WordPiece.segmentCountsFrom: empty artifact at $vocabPath")
    val kernel = WordPieceKernel.build(pieces)
    val seg = df.select(explode(TextAnalysis.wordTokens(col(textCol))).as("w"))
      .distinct()
      .select(col("w"), encodeTokens(col("w"), kernel).as("pieces"))
      .select(col("w"), size(col("pieces")).cast("long").as("_ns"),
        size(filter(col("pieces"), p => p === lit(WordPieceKernel.Unk)))
          .cast("long").as("_nunk"))
    df.select(col(idCol), explode_outer(TextAnalysis.wordTokens(col(textCol))).as("w"))
      .join(seg, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("_ns")), lit(0L)).as("n_subwords"),
        coalesce(sum(col("_nunk")), lit(0L)).as("n_unk"))
  }
}

/**
 * Greedy longest-match-first WordPiece encode kernel. The vocab rides
 * `ctx.addReferenceObj` (the [[BpeKernel]]/[[PqKernel]] pattern):
 * generated code is ONE static call, and matching is
 * O(len × maxPieceLen) hash probes per word — no trie build, no
 * per-row allocation beyond the output.
 */
object WordPieceKernel {

  val Unk = "[UNK]"

  /** Driver-built vocab snapshot: piece set + the longest bare /
    * continuation piece lengths (code-unit lengths net of `##`),
    * bounding the longest-match scan. */
  final class Vocab(val pieces: java.util.HashSet[String],
                    val maxBare: Int, val maxCont: Int) extends Serializable

  def build(pieces: Array[String]): Vocab = {
    require(pieces.nonEmpty, "wordpiece encode: empty vocab")
    val set = new java.util.HashSet[String](pieces.length * 2)
    var maxBare = 0
    var maxCont = 0
    pieces.foreach { p =>
      require(p != null && p.nonEmpty && p != "##",
        s"wordpiece encode: invalid piece '$p'")
      set.add(p)
      if (p.startsWith("##")) maxCont = math.max(maxCont, p.length - 2)
      else maxBare = math.max(maxBare, p.length)
    }
    new Vocab(set, maxBare, maxCont)
  }

  /** Encode one word; whole word becomes `[UNK]` on any unmatchable
    * position. Empty input → empty array. */
  def encode(word: UTF8String, v: Vocab): GenericArrayData = {
    val w = word.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    if (w.contains("#"))
      throw new IllegalArgumentException(
        s"wordpiece: word '$w' contains '#' — the '##' continuation " +
        "sentinel would be ambiguous; strip or remap '#' upstream")
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](4)
    var pos = 0
    while (pos < w.length) {
      val maxLen = math.min(if (pos == 0) v.maxBare else v.maxCont,
        w.length - pos)
      var l = maxLen
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand =
          if (pos == 0) w.substring(0, l)
          else "##" + w.substring(pos, pos + l)
        if (v.pieces.contains(cand)) hit = cand
        else l -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))
      out += UTF8String.fromString(hit)
      pos += l
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `wordpiece_encode(word)` → array<string> pieces under the loaded
  * vocab (reference equality — nodes from different vocabs never
  * compare equal). */
case class WordPieceEncodeExpr(child: Expression, vocab: WordPieceKernel.Vocab)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_encode"
  override protected def nullSafeEval(v: Any): Any =
    WordPieceKernel.encode(v.asInstanceOf[UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceVocab", vocab,
      classOf[WordPieceKernel.Vocab].getName)
    defineCodeGen(ctx, ev, a => s"graft.ext.WordPieceKernel.encode($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
