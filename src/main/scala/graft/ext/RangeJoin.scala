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
   * All (point, interval) pairs with `lo <= point <= hi` — or the
   * strict/half-open variants via `loInclusive`/`hiInclusive` (a
   * half-open `[lo, hi)` is `hiInclusive = false`, the SCD2/
   * timestamp-validity convention; binning is identical because bins
   * only over-approximate and strictness lives in the exact verify).
   * Output = the point frame's columns ++ the interval frame's columns
   * (names must be disjoint — refused loudly otherwise).
   *
   * `nullBoundIsOpen = true` switches NULL bounds from "matches
   * nothing" (the BETWEEN convention, and the default) to "unbounded on
   * that side" — the open-ended-interval convention of SCD2 current
   * versions (`valid_to IS NULL`). An open bound's bin is COALESCEd to
   * the point side's own min/max bin (one extra slim aggregate over the
   * points, only taken in this mode), so an open interval spans only
   * the bins where points actually exist — bounded by the data.
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
   *  - NULL (unless `nullBoundIsOpen`) or inverted (`lo > hi`)
   *    intervals are a bug upstream, not an empty match set — refused
   *    loudly, never silently dropped.
   *  - NULL points match nothing (kept out of both paths).
   *
   * The guard counts ride ONE aggregate over the interval side (plus
   * one over the points in open-bound mode).
   */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBinsPerInterval: Int = 1024,
                      maxWideIntervals: Int = 10000,
                      loInclusive: Boolean = true,
                      hiInclusive: Boolean = true,
                      nullBoundIsOpen: Boolean = false,
                      saltBins: Int = 0): DataFrame = {
    require(binWidth > 0.0 && !binWidth.isInfinite, s"binWidth > 0, got $binWidth")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval >= 1")
    require(saltBins == 0 || saltBins >= 2,
      s"saltBins: 0 (off) or >= 2, got $saltBins")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInInterval: column names must be disjoint, both sides have " +
        s"${overlap.mkString(", ")} — rename one side")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    // open-bound mode: the point side's own bin range closes the open
    // ends (an empty point side degenerates to a single never-matching
    // bin — correct, since there is nothing to match)
    val (minPBin, maxPBin): (Long, Long) =
      if (!nullBoundIsOpen) (0L, 0L)
      else {
        val r = points.filter(col(pointCol).isNotNull)
          .agg(min(bin(col(pointCol))), max(bin(col(pointCol)))).head()
        if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
      }
    val loB = if (nullBoundIsOpen) coalesce(bin(col(loCol)), lit(minPBin)) else bin(col(loCol))
    val hiB0 = if (nullBoundIsOpen) coalesce(bin(col(hiCol)), lit(maxPBin)) else bin(col(hiCol))
    // a coalesced edge can land below the other bound (an open-ended
    // interval starting after the last point matches nothing, not an
    // illegal descending `sequence`)
    val hiB = if (nullBoundIsOpen) greatest(hiB0, loB) else hiB0
    val spanBins = hiB - loB + 1L
    val badIv =
      if (nullBoundIsOpen)
        col(loCol).isNotNull && col(hiCol).isNotNull &&
          col(loCol).cast("double") > col(hiCol).cast("double")
      else
        col(loCol).isNull || col(hiCol).isNull ||
          col(loCol).cast("double") > col(hiCol).cast("double")
    val guard = intervals.agg(
      count(when(badIv, 1)).as("bad"),
      count(when(spanBins > maxBinsPerInterval, 1)).as("wide")).head()
    require(guard.getLong(0) == 0L,
      s"pointInInterval: ${guard.getLong(0)} interval rows are NULL or " +
        s"inverted (lo > hi) — a bug upstream, not an empty match; clean " +
        "the interval side first" +
        (if (nullBoundIsOpen) "" else
          " (or pass nullBoundIsOpen = true if NULL means unbounded)") + ".")
    require(guard.getLong(1) <= maxWideIntervals,
      s"pointInInterval: ${guard.getLong(1)} intervals span more than " +
        s"$maxBinsPerInterval bins at binWidth=$binWidth and would take " +
        s"the broadcast wide path (cap $maxWideIntervals). Use a larger " +
        "binWidth, or raise maxWideIntervals deliberately.")
    val p = points.filter(col(pointCol).isNotNull)
      .withColumn("_pbin", bin(col(pointCol)))
    def sideOk(bound: Column, cmp: Column): Column =
      if (nullBoundIsOpen) bound.isNull || cmp else cmp
    val pd = col(pointCol).cast("double")
    val within =
      sideOk(col(loCol),
        if (loInclusive) pd >= col(loCol).cast("double")
        else pd > col(loCol).cast("double")) &&
      sideOk(col(hiCol),
        if (hiInclusive) pd <= col(hiCol).cast("double")
        else pd < col(hiCol).cast("double"))
    val short = intervals.filter(spanBins <= maxBinsPerInterval)
      .withColumn("_ibin", explode(sequence(loB, hiB)))
    // saltBins: a hot bin (one minute holding a large share of the
    // points) is ordinary join skew on the exploded frames — route the
    // bin equi-join through Skew.saltedJoin (points salted, exploded
    // interval side replicated saltBins ways); row-identical by its
    // contract. Same knob as intervalOverlapJoin's.
    val shortPairs =
      if (saltBins >= 2)
        Skew.saltedJoin(p.withColumnRenamed("_pbin", "_ibin"), short,
            Seq("_ibin"), saltBins)
          .filter(within).drop("_ibin")
      else p.join(short, col("_pbin") === col("_ibin"))
        .filter(within).drop("_pbin", "_ibin")
    val widePairs = p.drop("_pbin")
      .join(broadcast(intervals.filter(spanBins > maxBinsPerInterval)), within)
    shortPairs.unionByName(widePairs)
  }

  /**
   * FUSED exact range-aggregate —
   * `DecimalSums.groupSumExact(pointInInterval(...), groupCols,
   * pointCol, scale, outName, extraAggs = count as cntName)` computed
   * WITHOUT materializing the (point, interval) pair stream. Output is
   * one row per `groupCols` group that matches >= 1 point: the group
   * columns ++ `cntName` (matched-pair count, long) ++ `outName`
   * (exact DECIMAL(38, scale) sum of the point values, pinned
   * `floor(x·10^scale + 0.5)` rule) — row-identical to the unfused
   * composition by the limb argument below.
   *
   * Why it exists (optimization r15, guide §2.3 "aggregate before you
   * shuffle" / §8 "decide with small rows"): the unfused composition
   * streams EVERY matched pair into the aggregate. For the WIDE
   * intervals that is a BroadcastNestedLoopJoin emitting
   * |points|·|wide| rows that immediately collapse into |wide| sums —
   * measured ~10 s of the q161 gate at sf0.1 (~125M emitted pair rows
   * from 207 wide bands x 600k points). Here the wide path
   * pre-aggregates the points ONCE per bin ((bin, limb sums, count) —
   * at most a few thousand slim rows), then:
   *   - INTERIOR bins (strictly between the interval's lo/hi bins) are
   *     fully covered — every point in bin b with loB < b < hiB
   *     satisfies lo < b·W <= p < (b+1)·W <= hi for ANY inclusivity
   *     choice (loB = floor(lo/W) makes lo < (loB+1)·W <= b·W, and
   *     hiB = floor(hi/W) makes (b+1)·W <= hiB·W <= hi) — so the
   *     interval takes the bin's pre-aggregated limbs as-is. Interior
   *     coverage is a RANGE JOIN of the occupied-bin aggregates against
   *     the broadcast wide set (r16; was explode(sequence) clamped by
   *     the occupied-bin RANGE, where one outlier point could stretch
   *     the clamp into a multi-hundred-million-element array per wide
   *     interval) — nested-loop work is |occupied bins| x |wide|, with
   *     |wide| <= maxWideIntervals enforced by the guard;
   *   - the <= 2 EDGE bins (b = loB, b = hiB) fall back to row-level
   *     `within` checks against just those bins' points.
   * The short path is the same binned hash join as [[pointInInterval]]
   * with the aggregation pushed below the union.
   *
   * EXACTNESS: the limb-decomposed long partial sums are plain integer
   * additions — fully associative and commutative — so regrouping
   * (per-bin first, per-interval second) recombines to the bit-identical
   * DECIMAL(38, scale); the count is additive the same way. The group
   * SET is identical too: a group appears iff it matches >= 1 point, on
   * both shapes (inner joins everywhere). The only observable
   * deviation, documented here the way EnvelopePrefilter documents its
   * pruned-refusal deviation: the NaN/magnitude refusal of the staging
   * rule is evaluated per POINT (pre-aggregation) instead of per
   * matched pair, so a NaN point that matches NO interval refuses here
   * where the unfused plan would not have evaluated it. NULL points
   * match nothing in both shapes.
   *
   * Closed/sided bounds via `loInclusive`/`hiInclusive` exactly as
   * [[pointInInterval]]; the `nullBoundIsOpen` mode is NOT offered —
   * NULL or inverted bounds refuse (same guard as the pair operator).
   */
  def pointInIntervalSumExact(points: DataFrame, pointCol: String,
                              intervals: DataFrame,
                              loCol: String, hiCol: String,
                              binWidth: Double,
                              groupCols: Seq[String], scale: Int,
                              outName: String, cntName: String = "cnt",
                              maxBinsPerInterval: Int = 1024,
                              maxWideIntervals: Int = 10000,
                              loInclusive: Boolean = true,
                              hiInclusive: Boolean = true): DataFrame = {
    require(binWidth > 0.0 && !binWidth.isInfinite, s"binWidth > 0, got $binWidth")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval >= 1")
    require(groupCols.nonEmpty, "pointInIntervalSumExact: groupCols empty")
    groupCols.foreach(g => require(intervals.columns.contains(g),
      s"pointInIntervalSumExact: group column '$g' missing from intervals"))
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInIntervalSumExact: column names must be disjoint, both " +
        s"sides have ${overlap.mkString(", ")} — rename one side")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    val loB = bin(col(loCol))
    val hiB = bin(col(hiCol))
    val spanBins = hiB - loB + 1L
    val badIv = col(loCol).isNull || col(hiCol).isNull ||
      col(loCol).cast("double") > col(hiCol).cast("double")
    val guard = intervals.agg(
      count(when(badIv, 1)).as("bad"),
      count(when(spanBins > maxBinsPerInterval, 1)).as("wide")).head()
    require(guard.getLong(0) == 0L,
      s"pointInIntervalSumExact: ${guard.getLong(0)} interval rows are " +
        "NULL or inverted (lo > hi) — a bug upstream, not an empty match; " +
        "clean the interval side first.")
    require(guard.getLong(1) <= maxWideIntervals,
      s"pointInIntervalSumExact: ${guard.getLong(1)} intervals span more " +
        s"than $maxBinsPerInterval bins at binWidth=$binWidth " +
        s"(cap $maxWideIntervals). Use a larger binWidth, or raise " +
        "maxWideIntervals deliberately.")
    val pd = col(pointCol).cast("double")
    val within =
      (if (loInclusive) pd >= col(loCol).cast("double")
       else pd > col(loCol).cast("double")) &&
      (if (hiInclusive) pd <= col(hiCol).cast("double")
       else pd < col(hiCol).cast("double"))
    val staged = DecimalSums
      .limbStaged(points.filter(col(pointCol).isNotNull), col(pointCol), scale)
      .withColumn("_pbin", bin(col(pointCol)))
      .select(col(pointCol), col("_pbin"),
        col("_ds_h"), col("_ds_m"), col("_ds_l"))
    val gCols = groupCols.map(col)
    def partial(df: DataFrame): DataFrame =
      df.groupBy(gCols: _*).agg(
        sum(col("_ds_h")).as("_ps_h"), sum(col("_ds_m")).as("_ps_m"),
        sum(col("_ds_l")).as("_ps_l"), count(lit(1)).as("_ps_n"))
    // ---- short intervals: binned hash join + row-level verify --------
    val short = intervals.filter(spanBins <= maxBinsPerInterval)
      .withColumn("_ibin", explode(sequence(loB, hiB)))
    val shortPart = partial(
      staged.join(short, col("_pbin") === col("_ibin")).filter(within))
    // ---- wide intervals (only when the guard saw any: an all-short
    // workload pays no binAgg aggregate and no union legs) -------------
    val combinedParts = if (guard.getLong(1) == 0L) shortPart else {
      val wide = intervals.filter(spanBins > maxBinsPerInterval)
      // per-bin pre-aggregation of the points (slim: one row per
      // occupied bin)
      val binAgg = staged.groupBy(col("_pbin")).agg(
        sum(col("_ds_h")).as("_pb_h"), sum(col("_ds_m")).as("_pb_m"),
        sum(col("_ds_l")).as("_pb_l"), count(lit(1)).as("_pb_n"))
      // interior bins via a RANGE JOIN against the OCCUPIED bins — not
      // explode(sequence(loB+1, hiB-1)): one outlier point used to
      // stretch the explode clamp so a wide interval could build a
      // multi-hundred-million-element array per row (OOM / sequence
      // length error; r16 ADVICE fix). The broadcast side is the wide
      // interval set, capped at maxWideIntervals by the guard, so this
      // nested-loop leg is bins x (<= maxWideIntervals slim rows) —
      // work proportional to occupied bins, never to empty bin ranges.
      val interior = binAgg.join(broadcast(wide),
        col("_pbin") >= loB + 1L && col("_pbin") <= hiB - 1L)
      val interiorPart = interior.groupBy(gCols: _*).agg(
        sum(col("_pb_h")).as("_ps_h"), sum(col("_pb_m")).as("_ps_m"),
        sum(col("_pb_l")).as("_ps_l"), sum(col("_pb_n")).as("_ps_n"))
      // edge bins: row-level verify against just those bins' points
      val edges = wide
        .withColumn("_ibin", explode(array_distinct(array(loB, hiB))))
        .join(staged, col("_pbin") === col("_ibin")).filter(within)
      val edgePart = partial(edges)
      shortPart.unionByName(interiorPart).unionByName(edgePart)
    }
    // ---- combine: partial limb sums reassociate exactly --------------
    val combined = combinedParts
      .groupBy(gCols: _*).agg(
        sum(col("_ps_h")).as("_ds_sh"), sum(col("_ps_m")).as("_ds_sm"),
        sum(col("_ps_l")).as("_ds_sl"), sum(col("_ps_n")).as("_ds_n"))
      .withColumn(cntName, col("_ds_n"))
    DecimalSums.limbFinish(combined, outName, scale)
  }

  /**
   * INTERVAL-OVERLAP join — all (a, b) pairs whose intervals overlap
   * (`aLo <= bHi AND bLo <= aHi`; `touchIsOverlap = false` makes
   * boundary contact NOT count, the half-open-session convention).
   * The interval-x-interval sibling of [[pointInInterval]], same
   * binned-hash-join shape, with the LATER-START-BIN rule making every
   * true pair match EXACTLY once with no dedup pass: both sides
   * explode to their covered bins, and a candidate only fires in
   * `bin == max(binOf(aLo), binOf(bLo))` — a bin both sides cover
   * whenever they truly overlap (the later start lies inside both
   * intervals, and binOf is monotone), and only one bin equals the max.
   *
   * Scale: shuffle carries each interval once per covered bin — pick
   * `binWidth` near the typical interval length. Wide intervals
   * (span > `maxBinsPerInterval` bins) on EITHER side take a broadcast
   * path instead of exploding (wide-A x all-B, then short-A x wide-B —
   * disjoint by construction, so nothing double-counts), capped at
   * `maxWideIntervals` per side with a loud refusal. NULL or inverted
   * intervals are refused loudly, never silently dropped.
   */
  def intervalOverlapJoin(a: DataFrame, aLo: String, aHi: String,
                          b: DataFrame, bLo: String, bHi: String,
                          binWidth: Double,
                          maxBinsPerInterval: Int = 1024,
                          maxWideIntervals: Int = 10000,
                          touchIsOverlap: Boolean = true,
                          saltBins: Int = 0): DataFrame = {
    require(binWidth > 0.0 && !binWidth.isInfinite, s"binWidth > 0, got $binWidth")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval >= 1")
    require(saltBins == 0 || saltBins >= 2,
      s"saltBins: 0 (off) or >= 2, got $saltBins")
    val overlapCols = a.columns.toSet.intersect(b.columns.toSet)
    require(overlapCols.isEmpty,
      s"intervalOverlapJoin: column names must be disjoint, both sides " +
        s"have ${overlapCols.mkString(", ")} — rename one side")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    def guardSide(df: DataFrame, lo: String, hi: String, side: String): Unit = {
      val span = bin(col(hi)) - bin(col(lo)) + 1L
      val g = df.agg(
        count(when(col(lo).isNull || col(hi).isNull ||
          col(lo).cast("double") > col(hi).cast("double"), 1)).as("bad"),
        count(when(span > maxBinsPerInterval, 1)).as("wide")).head()
      require(g.getLong(0) == 0L,
        s"intervalOverlapJoin: ${g.getLong(0)} $side rows are NULL or " +
          "inverted (lo > hi) — a bug upstream, not an empty match")
      require(g.getLong(1) <= maxWideIntervals,
        s"intervalOverlapJoin: ${g.getLong(1)} $side intervals span more " +
          s"than $maxBinsPerInterval bins at binWidth=$binWidth " +
          s"(cap $maxWideIntervals) — use a larger binWidth, or raise " +
          "maxWideIntervals deliberately")
    }
    guardSide(a, aLo, aHi, "left")
    guardSide(b, bLo, bHi, "right")
    val overlaps =
      if (touchIsOverlap)
        col(aLo).cast("double") <= col(bHi).cast("double") &&
          col(bLo).cast("double") <= col(aHi).cast("double")
      else
        col(aLo).cast("double") < col(bHi).cast("double") &&
          col(bLo).cast("double") < col(aHi).cast("double")
    def shortSide(df: DataFrame, lo: String, hi: String, binName: String) =
      df.filter(bin(col(hi)) - bin(col(lo)) + 1L <= maxBinsPerInterval)
        .withColumn(binName, explode(sequence(bin(col(lo)), bin(col(hi)))))
    def wideSide(df: DataFrame, lo: String, hi: String) =
      df.filter(bin(col(hi)) - bin(col(lo)) + 1L > maxBinsPerInterval)
    val laterStartBin =
      col("_abin") === greatest(bin(col(aLo)), bin(col(bLo)))
    // saltBins routes the bin-key equi-join through Skew.saltedJoin
    // (a hot bin — one minute holding 20% of all sessions — is
    // ordinary join skew on the exploded frames); the b side renames
    // its bin to the shared key name so the salted equi-join applies,
    // and laterStartBin still reads the merged key. Row-identical by
    // saltedJoin's contract.
    val shortPairs =
      if (saltBins >= 2)
        Skew.saltedJoin(shortSide(a, aLo, aHi, "_abin"),
            shortSide(b, bLo, bHi, "_abin"), Seq("_abin"), saltBins)
          .filter(laterStartBin && overlaps)
          .drop("_abin")
      else shortSide(a, aLo, aHi, "_abin")
        .join(shortSide(b, bLo, bHi, "_bbin"), col("_abin") === col("_bbin"))
        .filter(laterStartBin && overlaps)
        .drop("_abin", "_bbin")
    val wideA = wideSide(a, aLo, aHi)
    val wideB = wideSide(b, bLo, bHi)
    val widePairs = b.crossJoin(broadcast(wideA)).filter(overlaps)
      .unionByName(
        a.filter(bin(col(aHi)) - bin(col(aLo)) + 1L <= maxBinsPerInterval)
          .crossJoin(broadcast(wideB)).filter(overlaps))
      .select(shortPairs.columns.map(col): _*)
    shortPairs.unionByName(widePairs)
  }
}
