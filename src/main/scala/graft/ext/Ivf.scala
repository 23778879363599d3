package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * IVF (inverted-file) approximate nearest neighbor: a k-means coarse
 * quantizer (Spark MLlib, fixed seed) partitions the corpus into cells;
 * a query scans only its `nprobe` nearest cells.
 *
 * The 100 TB path: the corpus is written partitioned by `ivf_cell`
 * (partition pruning skips everything but the probed cells), the centroid
 * table is tiny and broadcast, and ranking uses the bounded TopKByScore
 * heap — per-query work is |probed cells| * cell size, not |corpus|.
 * Vectors are L2-normalized before clustering so euclidean cells align
 * with cosine ranking.
 */
object Ivf {

  case class Model(centroids: Array[Array[Float]]) {
    def k: Int = centroids.length
  }

  private def normalized(vecCol: Column): Column = {
    val n = sqrt(aggregate(vecCol, lit(0.0d), (acc, x) => acc + x * x))
    transform(vecCol, x => when(n === 0.0, 0.0f).otherwise((x / n).cast("float")))
  }

  /** Train the coarse quantizer (deterministic: fixed seed + init). */
  def train(corpus: DataFrame, vecCol: String, k: Int = 16,
            maxIter: Int = 10, seed: Long = 42L): Model = {
    val prepared = corpus
      .select(array_to_vector(normalized(col(vecCol))).as("features"))
    val km = new KMeans().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features")
    val model = km.fit(prepared)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Cell ids of the `n` nearest centroids (ordered). */
  private[ext] case class NearestCells(model: Model, n: Int, child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "ivf_nearest_cells"
    override protected def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val d = a.numElements()
      // normalize the input once
      var norm = 0.0
      var i = 0
      while (i < d) { val x = a.getFloat(i); norm += x * x; i += 1 }
      val inv = if (norm == 0) 0.0 else 1.0 / math.sqrt(norm)
      val scored = Array.tabulate(model.k) { c =>
        val cen = model.centroids(c)
        var dot = 0.0
        var j = 0
        while (j < math.min(d, cen.length)) { dot += a.getFloat(j) * inv * cen(j); j += 1 }
        (c, dot)
      }
      new GenericArrayData(
        scored.sortBy { case (c, s) => (-s, c) }.take(n).map(_._1))
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Register a temp function binding this model's NearestCells expression
    * (the session registry is the public route from Expression to Column). */
  private def cellsFn(df: DataFrame, model: Model, n: Int): String = {
    val fname = s"ivf_cells_${System.identityHashCode(model)}_$n"
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      fname, { case Seq(v) => NearestCells(model, n, v) }, "scala_udf")
    fname
  }

  /** Attach the IVF cell id (nearest centroid) to every corpus row. */
  def assign(corpus: DataFrame, vecCol: String, model: Model): DataFrame = {
    val f = cellsFn(corpus, model, 1)
    corpus.withColumn("ivf_cell",
      element_at(call_function(f, col(vecCol)), 1))
  }

  /** Search: probe `nprobe` cells per query, rank with the bounded heap. */
  def search(assignedCorpus: DataFrame, queries: DataFrame, model: Model,
             vecCol: String, idCol: String, k: Int = 10,
             nprobe: Int = 4): DataFrame = {
    val spark = assignedCorpus.sparkSession
    TextFunctions.registerAll(spark)
    val fname = cellsFn(queries, model, nprobe)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(call_function(fname, col(vecCol))).as("ivf_cell"))
    val c = assignedCorpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"), col("ivf_cell"))
    val scored = c.join(broadcast(q), Seq("ivf_cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        TextFunctions.cosine_sim(col("qv"), col("cv")).as("cosine"))
      .distinct()
    Similarity.rankTopK(scored, k)
  }
}
