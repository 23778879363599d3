package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) joins — the second relational operator Spark lacks a
 * scalable built-in for (a bare `BETWEEN` condition plans as
 * BroadcastNestedLoopJoin: |points|·|intervals| comparisons). The
 * binned equi-join shape keeps it a hash join: intervals explode to the
 * integer bins they span, points land in exactly one bin, the sides
 * equi-join on the bin and verify the exact predicate — every true pair
 * is produced EXACTLY once (the point's single bin is covered by each
 * containing interval's bin set exactly once), so no dedup pass.
 */
object RangeJoin {

  /**
   * All (point, interval) pairs with `lo <= point <= hi` (closed on
   * both ends, the SQL BETWEEN convention). Output = the point frame's
   * columns ++ the interval frame's columns (names must be disjoint —
   * refused loudly otherwise).
   *
   * Scale:
   *  - SHORT intervals (span ≤ `maxBinsPerInterval` bins) take the
   *    binned equi-join: shuffle is |intervals|·spanBins + |points|
   *    slim rows hashed by bin — pick `binWidth` near the typical
   *    interval length so the explode factor stays small.
   *  - WIDE intervals would explode (a whole-axis interval at a small
   *    binWidth is millions of bins), so they take a BROADCAST
   *    nested-loop against the points instead — justified because they
   *    are FEW, and that assumption is enforced: more than
   *    `maxWideIntervals` of them refuses loudly (pick a bigger
   *    binWidth, or raise the cap deliberately).
   *  - NULL or inverted (`lo > hi`) intervals are a bug upstream, not
   *    an empty match set — refused loudly, never silently dropped.
   *  - NULL points match nothing (kept out of both paths).
   *
   * The guard counts ride ONE aggregate over the interval side.
   */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBinsPerInterval: Int = 1024,
                      maxWideIntervals: Int = 10000): DataFrame = {
    require(binWidth > 0.0 && !binWidth.isInfinite, s"binWidth > 0, got $binWidth")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval >= 1")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInInterval: column names must be disjoint, both sides have " +
        s"${overlap.mkString(", ")} — rename one side")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    val spanBins = bin(col(hiCol)) - bin(col(loCol)) + 1L
    val guard = intervals.agg(
      count(when(col(loCol).isNull || col(hiCol).isNull ||
        col(loCol).cast("double") > col(hiCol).cast("double"), 1)).as("bad"),
      count(when(spanBins > maxBinsPerInterval, 1)).as("wide")).head()
    require(guard.getLong(0) == 0L,
      s"pointInInterval: ${guard.getLong(0)} interval rows are NULL or " +
        s"inverted (lo > hi) — a bug upstream, not an empty match; clean " +
        "the interval side first.")
    require(guard.getLong(1) <= maxWideIntervals,
      s"pointInInterval: ${guard.getLong(1)} intervals span more than " +
        s"$maxBinsPerInterval bins at binWidth=$binWidth and would take " +
        s"the broadcast wide path (cap $maxWideIntervals). Use a larger " +
        "binWidth, or raise maxWideIntervals deliberately.")
    val p = points.filter(col(pointCol).isNotNull)
      .withColumn("_pbin", bin(col(pointCol)))
    val within = col(pointCol).cast("double") >= col(loCol).cast("double") &&
      col(pointCol).cast("double") <= col(hiCol).cast("double")
    val short = intervals.filter(spanBins <= maxBinsPerInterval)
      .withColumn("_ibin",
        explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val shortPairs = p.join(short, col("_pbin") === col("_ibin"))
      .filter(within).drop("_pbin", "_ibin")
    val widePairs = p.drop("_pbin")
      .join(broadcast(intervals.filter(spanBins > maxBinsPerInterval)), within)
    shortPairs.unionByName(widePairs)
  }
}
