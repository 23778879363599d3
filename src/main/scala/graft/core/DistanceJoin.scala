package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Planar DISTANCE (radius) join via grid binning — the spatial sibling
 * of [[graft.plans.BinnedRangeJoin]]: "every (left, right) pair within
 * `radius`" without the cross join Spark would otherwise plan for a
 * non-equi spatial predicate. Points are binned to square grid cells
 * of side `cellSize >= radius`; the right side replicates into its
 * 3×3 cell neighborhood, the join is a plain HASH join on the cell
 * key, and the exact `dx² + dy² <= radius²` predicate verifies every
 * candidate — correctness never depends on the binning (any true pair
 * is at most one cell apart on each axis because `cellSize >= radius`;
 * the left point's cell appears exactly once in the right point's nine,
 * so no pair can duplicate).
 *
 * Coordinates are PLANAR (a projected CRS — metres in 3857/UTM via
 * [[GeoOps]] transforms, or any affine plane). Distance is pure
 * `-`/`*`/`+` arithmetic, so results are bit-deterministic across
 * engines (no trig; a haversine variant would inherit `sin`/`cos` ulp
 * classes at the radius boundary). NULL/NaN coordinates are REFUSED
 * loudly — a null cell key would silently drop the point from every
 * pair, which is a wrong answer, not a missing one.
 *
 * Scale: shuffle carries each left row once and each right row 9×
 * (cells are slim longs); the join is hash-partitioned on cell keys,
 * so density skew (a hot city cell) is ordinary join skew —
 * [[graft.ext.Skew.saltedJoin]] composes on the cell key if one cell
 * dominates, and `cellSize` trades replication (larger cells, fewer
 * duplicates of dense borders) against candidate-verify fan-in.
 */
object DistanceJoin {

  /**
   * All (left, right) pairs with planar distance <= `radius`. Returns
   * `left.* ++ right.* ++ (dist2, dist)` — `dist2` exact arithmetic,
   * `dist` its IEEE-correctly-rounded sqrt. Column names must be
   * disjoint (refused loudly otherwise).
   */
  def radiusJoin(left: DataFrame, right: DataFrame,
                 lx: String, ly: String, rx: String, ry: String,
                 radius: Double, cellSize: Option[Double] = None): DataFrame = {
    require(radius > 0 && !radius.isInfinite, s"radius must be finite > 0, got $radius")
    val cs = cellSize.getOrElse(radius)
    require(cs >= radius,
      s"cellSize ($cs) must be >= radius ($radius) — smaller cells would " +
      "need a wider neighborhood than 3x3 and silently lose pairs")
    Seq(lx -> left, ly -> left, rx -> right, ry -> right).foreach {
      case (c, df) => require(df.columns.contains(c),
        s"radiusJoin: column '$c' missing from ${df.columns.mkString("[", ",", "]")}")
    }
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"radiusJoin: overlapping column names ${overlap.mkString(",")} — " +
      "rename one side (the output carries both sides' columns)")
    Seq("_gcx", "_gcy", "dist2", "dist").foreach { c =>
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"radiusJoin: reserved output column '$c' already present — rename it")
    }
    def cell(x: Column, axis: String): Column =
      when(x.isNull || isnan(x),
        raise_error(concat(lit(s"radiusJoin: NULL/NaN $axis coordinate — "),
          lit("a null cell would silently drop the point from every pair")))
          .cast("long"))
        .otherwise(floor(x / cs).cast("long"))
    val l = left
      .withColumn("_gcx", cell(col(lx), "x"))
      .withColumn("_gcy", cell(col(ly), "y"))
    val r = right
      .withColumn("_dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("_gcx", cell(col(rx), "x") + col("_dx"))
      .withColumn("_gcy", cell(col(ry), "y") + col("_dy"))
      .drop("_dx", "_dy")
    val ddx = col(lx) - col(rx)
    val ddy = col(ly) - col(ry)
    l.join(r, Seq("_gcx", "_gcy"))
      .withColumn("dist2", ddx * ddx + ddy * ddy)
      .filter(col("dist2") <= lit(radius * radius))
      .withColumn("dist", sqrt(col("dist2")))
      .drop("_gcx", "_gcy")
  }

  /**
   * NEAREST-neighbor join: for every left point, its single closest
   * right point (ties to the smallest `rIdCol`). Exact, via ITERATIVE
   * RADIUS DOUBLING over [[radiusJoin]]: probe at `startRadius`,
   * resolve the lefts that found any candidate (all pairs within r are
   * present, so the per-left minimum at radius r IS the true nearest),
   * re-probe only the unresolved lefts at 2r, up to `maxRadius` —
   * log2(maxRadius/startRadius) rounds, each a hash join that carries
   * only the still-unmatched lefts. Lefts with no right point within
   * `maxRadius` are OMITTED (the bound is the caller's contract; an
   * unbounded search against an empty right side would never
   * terminate). VALUE-duplicate left rows collapse to one output row —
   * the group key is the whole left row; carry a unique id if
   * duplicates must survive.
   *
   * Scale: round i costs |unmatched_i| × (right density within 3×3
   * cells at radius 2^i) — geometrically fewer lefts against
   * geometrically larger cells; for realistic densities almost
   * everything resolves in round 1 and the tail pays the doubling.
   * Each round `localCheckpoint`s the shrinking unmatched set to stop
   * plan growth.
   */
  /**
   * k-NEAREST-neighbors join: for every left point, its k closest
   * right points with ranks (ties (dist2, right id) — the repo's
   * bounded-heap convention). Same iterative radius doubling as
   * [[nearestJoin]], with the resolution rule generalized: a left
   * resolves at the first radius where it has >= k candidates (all
   * pairs within r are present, so its k nearest are among them —
   * radiusJoin is exact); lefts with fewer than k candidates anywhere
   * within `maxRadius` are resolved AT maxRadius with however many
   * they have (never silently padded). Per-left top-k rides the
   * bounded-heap aggregate — no window, no sort. Right ids must be
   * integral (the heap's id slot); VALUE-duplicate left rows collapse
   * like [[nearestJoin]]'s.
   *
   * Returns `left.* ++ (rIdCol, dist2, dist, rank)`.
   */
  def knnJoin(left: DataFrame, right: DataFrame,
              lx: String, ly: String, rx: String, ry: String,
              rIdCol: String, k: Int,
              startRadius: Double, maxRadius: Double): DataFrame = {
    require(k >= 1, s"knnJoin: k must be >= 1, got $k")
    require(startRadius > 0 && maxRadius >= startRadius,
      s"need 0 < startRadius ($startRadius) <= maxRadius ($maxRadius)")
    require(right.columns.contains(rIdCol),
      s"knnJoin: id column '$rIdCol' missing from right side")
    val leftCols = left.columns.map(col)
    var unmatched = left
    var out: Option[DataFrame] = None
    var r = startRadius
    var done = false
    while (!done) {
      val atMax = r >= maxRadius
      val cand = radiusJoin(unmatched, right, lx, ly, rx, ry, r)
      // bounded heap per left: score = -dist2 (largest = closest),
      // ties to the smaller right id — the TopKAggregate convention
      val grouped = cand.groupBy(leftCols: _*)
        .agg(count(lit(1)).as("_ncand"),
          graft.ext.TopKAggregate.topk_by_score(
            col(rIdCol), -col("dist2"), k).as("_top"))
      val resolved =
        (if (atMax) grouped else grouped.filter(col("_ncand") >= k))
          .select(leftCols :+ posexplode(col("_top")): _*)
          .select(leftCols ++ Seq(col("col.id").as(rIdCol),
            (-col("col.score")).as("dist2"),
            sqrt(-col("col.score")).as("dist"),
            (col("pos") + 1).cast("int").as("rank")): _*)
      out = Some(out.map(_.unionByName(resolved)).getOrElse(resolved))
      if (atMax) done = true
      else {
        val resolvedKeys = resolved.filter(col("rank") === 1)
          .select(leftCols: _*)
        val next = unmatched.join(resolvedKeys,
          unmatched.columns.map(c => unmatched(c) <=> resolvedKeys(c))
            .reduce(_ && _), "left_anti").localCheckpoint()
        if (next.isEmpty) done = true
        else { unmatched = next; r = math.min(r * 2, maxRadius) }
      }
    }
    out.get
  }

  def nearestJoin(left: DataFrame, right: DataFrame,
                  lx: String, ly: String, rx: String, ry: String,
                  rIdCol: String,
                  startRadius: Double, maxRadius: Double): DataFrame = {
    require(startRadius > 0 && maxRadius >= startRadius,
      s"need 0 < startRadius ($startRadius) <= maxRadius ($maxRadius)")
    require(right.columns.contains(rIdCol),
      s"nearestJoin: id column '$rIdCol' missing from right side")
    var unmatched = left
    var out: Option[DataFrame] = None
    var r = startRadius
    var done = false
    while (!done) {
      val cand = radiusJoin(unmatched, right, lx, ly, rx, ry, r)
      // per-left argmin: (dist2 asc, right id asc) through the bounded
      // min_by struct — no window, no sort
      val leftCols = unmatched.columns.map(col)
      val best = cand.groupBy(leftCols: _*)
        .agg(min_by(
          struct(right.columns.map(col) :+ col("dist2") :+ col("dist"): _*),
          struct(col("dist2"), col(rIdCol))).as("_best"))
        .select(leftCols :+ col("_best.*"): _*)
      out = Some(out.map(_.unionByName(best)).getOrElse(best))
      // null-SAFE anti join: a left row with a NULL payload column must
      // still recognize itself as matched (EqualTo would re-probe and
      // re-emit it every round)
      val bestKeys = best.select(leftCols: _*)
      val next = unmatched.join(bestKeys,
        unmatched.columns.map(c => unmatched(c) <=> bestKeys(c))
          .reduce(_ && _), "left_anti")
      if (r >= maxRadius) done = true
      else {
        val remaining = next.localCheckpoint()
        if (remaining.isEmpty) done = true
        else { unmatched = remaining; r = math.min(r * 2, maxRadius) }
      }
    }
    out.get
  }
}
