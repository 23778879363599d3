package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted DISTINCT-COUNT sketch side tables — the analytics
 * counterpart of [[graft.streaming.EventStream.ingestSink]]'s
 * url/md5/minhash artifacts: a corpus-wide "how many distinct users /
 * URLs / documents" question at 100 TB must not rescan the corpus per
 * query, and exact per-partition distinct counts do not merge (distinct
 * is not additive). HyperLogLog sketches DO merge losslessly (the union
 * of two sketches at one lgK is exactly the sketch of the union), so
 * the side table stores one slim (partition, sketch) row per ingest
 * partition, appended as data arrives, and any window's distinct count
 * is a union-merge over the selected sketch rows — KBs read, never the
 * corpus. Built on Spark's own DataSketches HLL aggregates
 * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`, public
 * since 3.5) — codegen'd built-ins, no UDFs.
 *
 * Estimate quality: DataSketches HLL at the default lgK=12 has ~1.6 %
 * relative standard error; the q174 gate pins BOTH properties —
 * merge-of-parts equals sketch-of-whole EXACTLY, and the estimate lands
 * within 5 % of the exact count.
 */
object Sketches {

  /** Build (or rebuild) the whole sketch table: one row per value of
    * `partCol` — (partCol, sketch, n_rows). Partition-directory layout
    * (`partCol=<v>/`), so [[appendDistinctSketch]] can overwrite a
    * single partition idempotently. */
  def writeDistinctSketches(df: DataFrame, valueCol: String, partCol: String,
                            dir: String, lgK: Int = 12): Unit =
    df.groupBy(col(partCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(col(valueCol)).as("n_rows"))
      .write.mode("overwrite").partitionBy(partCol).parquet(dir)

  /** Incremental maintenance — the daily-ingest shape: sketch ONE new
    * partition's rows and overwrite exactly its `partCol=<v>` directory
    * (batch-id-keyed overwrite, the ingestSink recipe — replays are
    * idempotent). `rows` must be that partition's complete row set. */
  def appendDistinctSketch(rows: DataFrame, valueCol: String,
                           partCol: String, partValue: Any, dir: String,
                           lgK: Int = 12): Unit =
    rows.agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(col(valueCol)).as("n_rows"))
      .write.mode("overwrite").parquet(s"$dir/$partCol=$partValue")

  private def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Distinct-count estimate over the partitions selected by `where`
    * (None = all): a union-merge over the slim sketch rows — the corpus
    * is never touched. One O(1) driver row. */
  def mergedDistinct(spark: SparkSession, dir: String,
                     where: Option[org.apache.spark.sql.Column] = None): Long = {
    val t = load(spark, dir)
    val sel = where.map(t.filter).getOrElse(t)
    val r = sel.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false))).as("est"))
      .head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Per-partition estimates straight off the side table — (partCol,
    * n_est, n_rows), no corpus scan. */
  def partitionEstimates(spark: SparkSession, dir: String,
                         partCol: String): DataFrame =
    load(spark, dir).select(col(partCol),
      hll_sketch_estimate(col("sketch")).as("n_est"), col("n_rows"))
}
