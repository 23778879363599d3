package graft.ext

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-friendly expressions over [[TextOps]] kernels. */
case class CharShingles(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"
  override protected def nullSafeEval(s: Any, k: Any): Any =
    TextOps.shingles(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) => s"graft.ext.TextOps.shingles($s, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override protected def nullSafeEval(s: Any, n: Any): Any =
    TextOps.wordShingles(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.ext.TextOps.wordShingles($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class WordShinglePairs(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_pairs"
  override protected def nullSafeEval(s: Any, n: Any): Any =
    TextOps.wordShinglePairs(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.ext.TextOps.wordShinglePairs($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class NgramCharStats(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_char_stats"
  override protected def nullSafeEval(s: Any, n: Any): Any =
    TextOps.ngramCharStats(s.asInstanceOf[UTF8String], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) => s"graft.ext.TextOps.ngramCharStats($s, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(a: Any, n: Any): Any =
    TextOps.minhash(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n) => s"graft.ext.TextOps.minhash($a, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class SigSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sig_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.sigSimilarity(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextOps.sigSimilarity($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_overlap"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.sortedOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextOps.sortedOverlap($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(s: Any): Any =
    TextOps.nfcNormalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ext.TextOps.nfcNormalize($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextOps.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(s: Any): Any =
    TextOps.simhash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ext.TextOps.simhash($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextOps.hamming64($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class Fingerprint64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fingerprint64"
  override protected def nullSafeEval(s: Any): Any =
    TextOps.fingerprint(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ext.TextOps.fingerprint($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class LangId(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(s: Any): Any =
    TextOps.langId(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ext.TextOps.langId($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class TokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count"
  override protected def nullSafeEval(s: Any): Any =
    TextOps.tokenCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ext.TextOps.tokenCount($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class TokenOccurrences(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_occurrences"
  override protected def nullSafeEval(s: Any, t: Any): Any =
    TextOps.tokenOccurrences(s.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, t) => s"graft.ext.TextOps.tokenOccurrences($s, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class BpeCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_count"
  override protected def nullSafeEval(s: Any): Any =
    TextOps.bpeCount(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.ext.TextOps.bpeCount($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextOps.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextOps.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.TextOps.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class HyperplaneSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), IntegerType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_sig"
  override protected def nullSafeEval(v: Any, n: Any, s: Any): Any =
    TextOps.hyperplaneSig(v.asInstanceOf[ArrayData], n.asInstanceOf[Int], s.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, n, s) => s"graft.ext.TextOps.hyperplaneSig($v, $n, $s)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
}

/** Column API + SQL registration for the ext function family. */
object TextFunctions {
  def char_shingles(text: Column, k: Column): Column = call_function("char_shingles", text, k)
  def word_shingles(text: Column, n: Column): Column = call_function("word_shingles", text, n)
  def word_shingle_pairs(text: Column, n: Column): Column =
    call_function("word_shingle_pairs", text, n)
  def ngram_char_stats(text: Column, n: Column): Column =
    call_function("ngram_char_stats", text, n)
  def minhash_sig(shingles: Column, n: Column): Column = call_function("minhash_sig", shingles, n)
  def sig_similarity(a: Column, b: Column): Column = call_function("sig_similarity", a, b)
  def sorted_overlap(a: Column, b: Column): Column = call_function("sorted_overlap", a, b)
  def simhash64(text: Column): Column = call_function("simhash64", text)
  def nfc_normalize(text: Column): Column = call_function("nfc_normalize", text)
  def jaro_winkler(a: Column, b: Column): Column = call_function("jaro_winkler", a, b)
  def hamming64(a: Column, b: Column): Column = call_function("hamming64", a, b)
  def fingerprint64(text: Column): Column = call_function("fingerprint64", text)
  def lang_id(text: Column): Column = call_function("lang_id", text)
  def token_count(text: Column): Column = call_function("token_count", text)
  def token_occurrences(text: Column, term: Column): Column =
    call_function("token_occurrences", text, term)
  def bpe_count(text: Column): Column = call_function("bpe_count", text)
  def cosine_sim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def dot_product(a: Column, b: Column): Column = call_function("dot_product", a, b)
  def hyperplane_sig(v: Column, nbits: Column, seed: Column): Column =
    call_function("hyperplane_sig", v, nbits, seed)

  /** (name -> builder) pairs, shared by registerAll and GraftExtensions. */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq[
      (String, Seq[Expression] => Expression)](
    "char_shingles" -> { case Seq(a, b) => CharShingles(a, b) },
    "word_shingles" -> { case Seq(a, b) => WordShingles(a, b) },
    "word_shingle_pairs" -> { case Seq(a, b) => WordShinglePairs(a, b) },
    "ngram_char_stats" -> { case Seq(a, b) => NgramCharStats(a, b) },
    "minhash_sig" -> { case Seq(a, b) => MinHashSig(a, b) },
    "sig_similarity" -> { case Seq(a, b) => SigSimilarity(a, b) },
    "sorted_overlap" -> { case Seq(a, b) => SortedOverlap(a, b) },
    "simhash64" -> { case Seq(a) => SimHash64(a) },
    "nfc_normalize" -> { case Seq(a) => NfcNormalizeExpr(a) },
    "jaro_winkler" -> { case Seq(a, b) => JaroWinkler(a, b) },
    "hamming64" -> { case Seq(a, b) => Hamming64(a, b) },
    "fingerprint64" -> { case Seq(a) => Fingerprint64(a) },
    "lang_id" -> { case Seq(a) => LangId(a) },
    "token_count" -> { case Seq(a) => TokenCount(a) },
    "token_occurrences" -> { case Seq(a, b) => TokenOccurrences(a, b) },
    "bpe_count" -> { case Seq(a) => BpeCount(a) },
    "cosine_sim" -> { case Seq(a, b) => CosineSim(a, b) },
    "dot_product" -> { case Seq(a, b) => DotProduct(a, b) },
    "hyperplane_sig" -> { case Seq(a, b, c) => HyperplaneSig(a, b, c) },
    "topk_by_score" -> { case Seq(a, b, c) => TopKByScore(a, b, c) },
    "mg_sketch" -> { case Seq(a, b) => MgSketch(a, b) })

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
