package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PCA / whitening for embedding columns — the standard preprocessing
 * step in front of the ANN ladder (mean-center, rotate to principal
 * axes, optionally scale to unit variance; OPQ/IVF setups in faiss
 * run exactly this before coarse quantization).
 *
 * Spark-first decomposition of the classic two-phase algorithm:
 *  1. [[momentSums]] — ONE corpus pass building the d(d+1)/2 + d
 *     second/first-moment sums in LONG FORM (i, j, s): per-row
 *     products expand via codegen'd higher-order functions (no UDFs),
 *     map-side partial aggregation means the single shuffle carries
 *     ~d²/2 slim rows per partition, never the corpus. Sums
 *     accumulate in DECIMAL(38,12) — order-independent and exact, so
 *     the moment frame is deterministic and ORACLE-CHECKABLE (the
 *     same parse tree replays in any ANSI engine).
 *  2. [[fit]] — covariance assembled on the driver from the d×d
 *     moment frame (KBs), then a cyclic JACOBI eigen-decomposition
 *     (deterministic: fixed sweep order, fixed convergence threshold,
 *     sign normalized per component) — the d ≤ a-few-hundred regime
 *     where driver eigen is exact and free; corpus size only ever
 *     enters through phase 1.
 *  3. [[transform]] — projection y_c = (x − μ)·w_c as composed
 *     `zip_with`/`aggregate` column expressions (left-to-right
 *     association, deterministic), with `whiten` dividing by √λ_c.
 *
 * Reference: Pearson 1901 / Jolliffe, "Principal Component Analysis";
 * the faiss OPQ/PCA preprocessing chain (PCAMatrix).
 */
object Pca {

  /** Fitted model: `components` is k×d row-major, eigenvalue-descending,
    * sign-normalized (largest-|coordinate| entry positive). */
  case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                      components: Array[Array[Double]],
                      eigenvalues: Array[Double])

  /** The one-pass moment frame: rows (i, j, s_d) with 0 ≤ i ≤ j < dim
    * carrying Σ x_i·x_j, plus (i, -1, Σ x_i) first-moment rows —
    * decimal-accumulated, cast double. Deterministic; the gate's
    * oracle replays it verbatim. Refuses NULL / mis-sized vectors
    * loudly (a silent skip would bias every moment). */
  def momentSums(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    momentRows(df, vecCol, dim, Nil)
      .filter(!(col("i") === -1 && col("j") === -1))
      .select(col("i"), col("j"), col("s_dec").cast("double").as("s_d"))

  /** Long-form DECIMAL moment rows, optionally keyed by extra group
    * columns — the additive core: decimal sums merge EXACTLY in any
    * order/grouping, which is what makes the moment table
    * ([[writeMomentTable]]) bit-equivalent to a full-corpus pass. The
    * extra (-1, -1) row carries the vector COUNT so a selection of
    * moment rows is self-contained. */
  private def momentRows(df: DataFrame, vecCol: String, dim: Int,
                         keys: Seq[String]): DataFrame = {
    require(dim >= 1, s"momentSums: dim >= 1, got $dim")
    val v = col(vecCol)
    val bad = df.filter(v.isNull || size(v) =!= dim).count()
    require(bad == 0L,
      s"momentSums: $bad rows have NULL or non-$dim-dim '$vecCol' — " +
        "clean or filter them explicitly; silently skipping would bias " +
        "every moment")
    // Codegen-friendly shape — measured 20× over the original HOF-built
    // struct arrays + wide-decimal SUM (7 s for 2 k rows × 64 dims,
    // almost all of it boxed-BigDecimal aggregation buffers): explode a
    // LITERAL slot array (the generator iterates one shared array, no
    // per-row allocation), derive (i, j) by element_at into literal int
    // arrays, convert each slot's double to its scale-12 unscaled long
    // ([[MomentKernel.unscaled12]] — the PINNED floor(x*1e12 + 0.5)
    // rule, IEEE-replayable on every engine; NaN/Inf → NULL), split
    // into three 22-bit limbs with plain bit-ops (arithmetic shift =
    // floor division, negatives exact), SUM each limb as a vectorized
    // long, and recombine exactly ([[MomentKernel.limbsToDecimal]]).
    // Decimal addition is order-free and exact, so `s_dec` is
    // bit-identical to the old wide-decimal SUM; bounds (|x_i·x_j| <
    // 10^6, < 2^41 rows per group) are stated in the kernel's scaladoc.
    val slots = Seq((-1, -1)) ++ (0 until dim).map(i => (i, -1)) ++
      (for { i <- 0 until dim; j <- i until dim } yield (i, j))
    val iLit = typedLit(slots.map(_._1).toArray)
    val jLit = typedLit(slots.map(_._2).toArray)
    def at(i: Column) = element_at(col("_v"), (i + 1).cast("int")).cast("double")
    val mask = lit((1L << 22) - 1)
    // the d(d+1)/2-way fanout runs INSIDE the input partitions (map-side
    // partial agg); a small input read as one file = one partition would
    // single-thread it, so spread narrow inputs first — the repartition
    // moves only the slim raw vectors, and a corpus-sized input (many
    // partitions already) never pays it
    val spread = {
      val want = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < want) df.repartition(want) else df
    }
    spread.select(keys.map(col) :+ v.as("_v") :+
        explode(typedLit(slots.indices.toArray)).as("_slot"): _*)
      .select(keys.map(col) :+
        element_at(iLit, col("_slot") + 1).as("i") :+
        element_at(jLit, col("_slot") + 1).as("j") :+ col("_v").as("_v"): _*)
      .select(keys.map(col) :+ col("i") :+ col("j") :+
        MomentFunctions.moment_unscaled(
          when(col("i") === -1, lit(1.0))
            .when(col("j") === -1, at(col("i")))
            .otherwise(at(col("i")) * at(col("j")))).as("_u"): _*)
      .select(keys.map(col) :+ col("i") :+ col("j") :+
        shiftright(col("_u"), 44).as("_hi") :+
        shiftright(col("_u"), 22).bitwiseAND(mask).as("_mid") :+
        col("_u").bitwiseAND(mask).as("_lo"): _*)
      .groupBy(keys.map(col) :+ col("i") :+ col("j"): _*)
      .agg(sum(col("_hi")).as("_sh"), sum(col("_mid")).as("_sm"),
        sum(col("_lo")).as("_sl"))
      .select(keys.map(col) :+ col("i") :+ col("j") :+
        MomentFunctions.moment_limbs_dec(col("_sh"), col("_sm"), col("_sl"))
          .as("s_dec"): _*)
  }

  // ------------------- incremental moment side table -------------------
  // The moment frame is EXACTLY additive (decimal sums are
  // order-independent and lossless under merge), so PCA joins the
  // engine's side-table family: per-partition moment rows written at
  // ingest time, any selection's model fitted by summing the slim
  // decimal rows — zero corpus reads, and the result is BIT-IDENTICAL
  // to a full fit over the same underlying rows (same decimal totals
  // -> same covariance doubles -> same deterministic Jacobi).

  /** Build (or rebuild) the moment table: per `partCol` value, the
    * d(d+1)/2 + d + 1 decimal moment rows, partition-dir layout for
    * idempotent single-partition overwrite. */
  def writeMomentTable(df: DataFrame, vecCol: String, dim: Int,
                       partCol: String, dir: String): Unit =
    momentRows(df, vecCol, dim, Seq(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(dir)

  /** Incremental maintenance: moment rows of ONE partition's complete
    * row set, overwriting exactly its directory (idempotent). */
  def appendMomentPartition(rows: DataFrame, vecCol: String, dim: Int,
                            partCol: String, partValue: Any,
                            dir: String): Unit =
    momentRows(rows, vecCol, dim, Nil)
      .write.mode("overwrite").parquet(s"$dir/$partCol=$partValue")

  /** Fit from the moment table alone — zero corpus reads. `where`
    * selects partitions (None = all). Bit-identical to [[fit]] on the
    * same underlying rows. */
  def fitFromMoments(spark: org.apache.spark.sql.SparkSession, dir: String,
                     k: Int, where: Option[Column] = None): PcaModel = {
    val t = spark.read.parquet(dir)
    val sel = where.map(t.filter).getOrElse(t)
    val merged = sel.groupBy(col("i"), col("j"))
      .agg(sum(col("s_dec")).as("s_dec")).collect()
    require(merged.nonEmpty,
      "fitFromMoments: selection matched no moment partitions")
    var n = 0L
    var dim = 0
    merged.foreach { r =>
      if (r.getInt(0) < 0 && r.getInt(1) < 0)
        n = r.getDecimal(2).longValueExact()
      else dim = math.max(dim, r.getInt(0) + 1)
    }
    require(n >= 2, s"fitFromMoments: need >= 2 vectors, got $n")
    require(k >= 1 && k <= dim, s"fitFromMoments: k in [1, $dim], got $k")
    val sum1 = new Array[Double](dim)
    val sum2 = Array.ofDim[Double](dim, dim)
    merged.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      if (i >= 0) {
        val s = r.getDecimal(2).doubleValue()
        if (j < 0) sum1(i) = s
        else { sum2(i)(j) = s; sum2(j)(i) = s }
      }
    }
    fitFromArrays(dim, n, sum1, sum2, k)
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix (in
    * place): returns (eigenvalues, eigenvectors as columns of V).
    * Deterministic: fixed (p,q) sweep order, fixed threshold. */
  private[ext] def jacobiEigen(a: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-14 && sweep < 100) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d - 1) {
        var j = i + 1
        while (j < d) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit top-`k` principal components of `vecCol`. One corpus pass
    * ([[momentRows]]) + a driver-side d×d eigen problem. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val first = df.select(col(vecCol)).filter(col(vecCol).isNotNull).head()
    val dim = first.getSeq[Any](0).size
    require(k >= 1 && k <= dim, s"fit: k in [1, $dim], got $k")
    val moments = momentRows(df, vecCol, dim, Nil).collect()
    var n = 0L
    val sum1 = new Array[Double](dim)
    val sum2 = Array.ofDim[Double](dim, dim)
    moments.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      if (i < 0 && j < 0) n = r.getDecimal(2).longValueExact()
      else {
        val s = r.getDecimal(2).doubleValue()
        if (j < 0) sum1(i) = s
        else { sum2(i)(j) = s; sum2(j)(i) = s }
      }
    }
    require(n >= 2, s"fit: need >= 2 vectors, got $n")
    fitFromArrays(dim, n, sum1, sum2, k)
  }

  /** Shared driver-side tail of [[fit]] / [[fitFromMoments]] — mean,
    * biased covariance, Jacobi, eigen-descending order, deterministic
    * sign. Both callers feed decimal-exact sums, so the two paths are
    * bit-identical over the same underlying rows. */
  private def fitFromArrays(dim: Int, n: Long, sum1: Array[Double],
                            sum2: Array[Array[Double]], k: Int): PcaModel = {
    val mu = sum1.map(_ / n)
    // biased covariance C = S/n − μμᵀ (the PCA convention; projection
    // variance equals the eigenvalue exactly under the same divisor)
    val cov = Array.tabulate(dim, dim)((i, j) => sum2(i)(j) / n - mu(i) * mu(j))
    val (eig, vecs) = jacobiEigen(cov.map(_.clone()))
    val order = eig.indices.sortBy(i => -eig(i)).take(k)
    val comps = order.map { c =>
      val w = Array.tabulate(dim)(r => vecs(r)(c))
      // deterministic sign: the largest-|entry| coordinate is positive
      // (ties to the lowest index via strict >)
      var m = 0
      var i = 1
      while (i < dim) { if (math.abs(w(i)) > math.abs(w(m))) m = i; i += 1 }
      if (w(m) < 0) w.map(x => -x) else w
    }.toArray
    PcaModel(dim, n, mu, comps, order.map(eig).toArray)
  }

  /** Project `vecCol` onto the model's components: `outCol` =
    * array<double> of length k, y_c = (x − μ)·w_c (optionally /√λ_c
    * when `whiten` — refused for near-zero variance directions, where
    * whitening just amplifies noise 1/ε-fold). Pure column
    * expressions; the model rides the plan as literals. */
  def transform(df: DataFrame, vecCol: String, model: PcaModel,
                outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    if (whiten) model.eigenvalues.zipWithIndex.foreach { case (e, i) =>
      require(e > 1e-12,
        s"transform: whiten with eigenvalue $e at component $i — this " +
          "direction carries no variance; drop it (smaller k) instead " +
          "of amplifying noise by 1/sqrt(eps)")
    }
    val v = col(vecCol)
    val dims = model.components.zipWithIndex.map { case (w, c) =>
      val wl = array(w.map(lit): _*)
      val dot = aggregate(
        zip_with(v, wl, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      val muDot = model.mean.zip(w).map { case (m, ww) => m * ww }.sum
      val proj = dot - lit(muDot)
      if (whiten) proj / lit(math.sqrt(model.eigenvalues(c))) else proj
    }
    df.withColumn(outCol, array(dims: _*))
  }
}
