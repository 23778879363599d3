package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * ONE-PASS corpus profiling (the Deequ / TFDV data-validation shape):
 * per-column row counts, null counts, distinct estimates, min/max,
 * exact decimal-accumulated sums/means, quantile estimates and
 * dominant values — all sketched in a SINGLE aggregate scan of the
 * corpus, the only shape that works at 100 TB (a stats query per
 * column would be N full scans; exact multi-column distinct via
 * Expand multiplies the scan by the column count).
 *
 * Composition of the engine's sketch family, all codegen'd built-ins
 * or native expressions in one `agg`:
 *  - distinct: `approx_count_distinct` (HLL++, deterministic);
 *  - quantiles: DataSketches KLL (`kll_sketch_agg_double` +
 *    `get_quantile` in the same pass);
 *  - dominant value: [[MgSketch]] candidates in pass 1, then ONE
 *    exact `isin`-pushdown count per string column (pass 2, the
 *    [[HeavyHitters.frequentItems]] recipe) — with the Misra–Gries
 *    bound turned into a CERTIFICATE: the exact top candidate count
 *    exceeding n/(k+1) proves no non-candidate can beat it, so
 *    `top1_*` is the TRUE mode; when the bound cannot certify (no
 *    dominant value at this k), the fields are NULL rather than a
 *    plausible guess.
 *
 * Deterministic fields (gate-able): n_rows, n_nulls, min_s/max_s
 * (string-rendered), sum_d/mean_d (decimal-accumulated, cast double),
 * top1_item/top1_cnt (exact + certified, ties broken by item).
 * Estimate fields (pinned by bounds, not bytes): n_distinct_est
 * (HLL++ rsd 2 %), p25/p50/p75_est (KLL k=200, randomized
 * compaction).
 */
object Profile {

  private val outSchema = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("dtype", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_distinct_est", LongType, nullable = false),
    StructField("min_s", StringType, nullable = true),
    StructField("max_s", StringType, nullable = true),
    StructField("sum_d", DoubleType, nullable = true),
    StructField("mean_d", DoubleType, nullable = true),
    StructField("p25_est", DoubleType, nullable = true),
    StructField("p50_est", DoubleType, nullable = true),
    StructField("p75_est", DoubleType, nullable = true),
    StructField("top1_item", StringType, nullable = true),
    StructField("top1_cnt", LongType, nullable = true)))

  /** Profile `columns` of `df` in one corpus scan (+ one slim
    * pushdown-filtered pass per string column for the certified mode).
    * One output row per column, schema above. `mgK` bounds the mode
    * candidates per string column; a mode with share ≤ 1/(mgK+1)
    * cannot be certified and reports NULL. */
  def profile(df: DataFrame, columns: Seq[String], mgK: Int = 64,
              kllK: Int = 200, hllRsd: Double = 0.02): DataFrame = {
    require(columns.nonEmpty, "profile: no columns requested")
    val spark = df.sparkSession
    TextFunctions.registerAll(spark)
    val byName = df.schema.fields.map(f => f.name -> f).toMap
    columns.foreach { c =>
      require(byName.contains(c),
        s"profile: column '$c' not in ${df.schema.fieldNames.mkString(", ")}")
    }
    def isNum(c: String) = byName(c).dataType.isInstanceOf[NumericType]
    def isStr(c: String) = byName(c).dataType == StringType

    // ---- pass 1: ONE aggregate over the corpus ----
    val aggs = Seq.newBuilder[Column]
    aggs += count(lit(1)).as("__n")
    columns.foreach { c =>
      aggs += count(col(c)).as(s"__cnt_$c")
      aggs += approx_count_distinct(col(c), hllRsd).as(s"__dst_$c")
      aggs += min(col(c)).cast("string").as(s"__min_$c")
      aggs += max(col(c)).cast("string").as(s"__max_$c")
      if (isNum(c)) {
        aggs += sum(col(c).cast("decimal(38,6)")).cast("double")
          .as(s"__sum_$c")
        aggs += call_function("kll_sketch_agg_double",
          col(c).cast("double"), lit(kllK)).as(s"__kll_$c")
      }
      if (isStr(c))
        aggs += HeavyHitters.mg_sketch(col(c), mgK).as(s"__mg_$c")
    }
    val built = aggs.result()
    val row = df.agg(built.head, built.tail: _*).head()
    val nRows = row.getAs[Long]("__n")

    // ---- quantiles: one tiny select over the collected sketch bytes ----
    val numCols = columns.filter(isNum)
    val kllBytes = numCols.map(c =>
      c -> row.getAs[Array[Byte]](s"__kll_$c")).toMap
    val quantiles: Map[String, Seq[Double]] = {
      val live = numCols.filter(c =>
        kllBytes(c) != null && row.getAs[Long](s"__cnt_$c") > 0L)
      if (live.isEmpty) Map.empty
      else {
        val sels = live.map(c => call_function(
          "kll_sketch_get_quantile_double", lit(kllBytes(c)),
          array(lit(0.25), lit(0.5), lit(0.75))).as(s"q_$c"))
        val qr = spark.range(1).select(sels: _*).head()
        live.zipWithIndex.map { case (c, i) =>
          c -> qr.getSeq[Double](i).toSeq }.toMap
      }
    }

    // ---- pass 2: certified exact mode per string column ----
    val modes: Map[String, Option[(String, Long)]] =
      columns.filter(isStr).map { c =>
        val st = row.getAs[Row](s"__mg_$c")
        val nNotNull = st.getLong(0)
        val cands = st.getSeq[Row](1).map(_.getString(0))
        if (nNotNull == 0L || cands.isEmpty) c -> None
        else {
          val top = df.filter(col(c).isin(cands: _*))
            .groupBy(col(c).as("item")).agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col("item")).limit(1)
            .collect().headOption.map(r => (r.getString(0), r.getLong(1)))
          // MG certificate: any NON-candidate's true count is at most
          // n/(k+1); a candidate strictly above that bound is the
          // provable mode. Below it, report nothing rather than a guess.
          c -> top.filter(_._2 > nNotNull.toDouble / (mgK + 1))
        }
      }.toMap

    val out = columns.map { c =>
      val cnt = row.getAs[Long](s"__cnt_$c")
      val q = quantiles.get(c)
      val m = modes.getOrElse(c, None)
      Row(c, byName(c).dataType.simpleString, nRows, nRows - cnt,
        row.getAs[Long](s"__dst_$c"),
        row.getAs[String](s"__min_$c"), row.getAs[String](s"__max_$c"),
        if (isNum(c) && cnt > 0) row.getAs[Double](s"__sum_$c")
        else null,
        if (isNum(c) && cnt > 0)
          row.getAs[Double](s"__sum_$c") / cnt
        else null,
        q.map(s => Double.box(s(0))).orNull,
        q.map(s => Double.box(s(1))).orNull,
        q.map(s => Double.box(s(2))).orNull,
        m.map(_._1).orNull, m.map(x => Long.box(x._2)).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), outSchema)
  }
}
