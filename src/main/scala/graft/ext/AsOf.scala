package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-time (AS-OF) joins — the temporal operator Spark lacks as a
 * built-in (kdb's `aj`, Pandas `merge_asof`, DuckDB `ASOF JOIN`, Flink
 * temporal table join): each left (event) row is matched to the single
 * right (dimension/quote) row with the LARGEST right timestamp that is
 * `<=` the left timestamp within the same key — "what was the state of
 * this entity when the event happened". The canonical consumer is an
 * event stream joined to slowly-changing dimension snapshots, or trades
 * joined to quotes.
 */
object AsOf {

  /**
   * As-of join, the union-window formulation: both sides are tagged and
   * UNIONED, one window partitioned by key and ordered by (ts, side)
   * carries the last dimension payload forward, and the left rows are
   * filtered back out annotated with the carried payload.
   *
   * `direction` (the `merge_asof` knob):
   *  - `"backward"` (default): the LATEST dimension row at-or-before
   *    the event — "state when the event happened";
   *  - `"forward"`: the EARLIEST dimension row at-or-after the event —
   *    the same union window ordered DESCENDING (a forward as-of IS a
   *    backward as-of on reversed time; ordering instead of negating
   *    keeps timestamps first-class, no micros round-trip);
   *  - `"nearest"`: the closer of the two candidates, each
   *    tolerance-checked on its own side first; EXACT distance compare
   *    (microseconds for timestamps), ties go to the BACKWARD match
   *    (the pandas convention). Both windows share one hash exchange —
   *    the second direction costs a sort, not a shuffle.
   *
   * Semantics:
   *  - a dimension row at EXACTLY the event timestamp matches in every
   *    direction (side order puts dim rows before event rows at equal
   *    ts under either ordering);
   *  - events with no dimension row on the matching side get NULL
   *    payload columns and a NULL `matched_ts` (a left join, never
   *    dropped);
   *  - `toleranceSeconds` voids matches further from the event than the
   *    tolerance (in truncated epoch seconds, both directions — the
   *    documented backward convention mirrored) — payload AND
   *    `matched_ts` revert to NULL, not the row to dropped;
   *  - NULL left timestamps or keys match nothing (NULL payload); right
   *    rows with NULL ts or key can match nothing and are dropped.
   *
   * The right side must be UNIQUE per (key, ts) — two states of one
   * entity at one instant is a contradiction, and any silent pick would
   * be nondeterministic. Verified with one aggregate over the right
   * side by default (`verifyUnique = false` skips the pass when the
   * producer guarantees it, e.g. output of a groupBy snapshot).
   *
   * Scale: ONE hash shuffle of each side by the join key, zero
   * broadcast, zero range-explosion — the union window is the classic
   * scalable as-of shape (a naive `l.ts >= r.ts` range join explodes to
   * |L|·|R_key| candidates before picking the max). Per-key work is a
   * sequential scan of that key's merged timeline, so per-key
   * cardinality — not corpus size — bounds a task; skewed keys behave
   * like any single-key window (salt upstream if one key dominates).
   */
  def asofJoin(left: DataFrame, leftTsCol: String, leftKeyCol: String,
               right: DataFrame, rightTsCol: String, rightKeyCol: String,
               payloadCols: Seq[String],
               toleranceSeconds: Option[Long] = None,
               verifyUnique: Boolean = true,
               direction: String = "backward"): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin: need at least one payload column")
    require(toleranceSeconds.forall(_ >= 0), "toleranceSeconds must be >= 0")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asofJoin: direction must be backward | forward | nearest, got '$direction'")
    val clash = left.columns.toSet
      .intersect(payloadCols.toSet + "matched_ts")
    require(clash.isEmpty,
      s"asofJoin: output would carry duplicate column names " +
        s"${clash.mkString(", ")} — the left frame already has them; " +
        "rename one side")
    import org.apache.spark.sql.expressions.Window
    val dupes =
      if (!verifyUnique) 0L
      else right.filter(col(rightTsCol).isNotNull && col(rightKeyCol).isNotNull)
        .groupBy(col(rightKeyCol), col(rightTsCol))
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
        .limit(1).count()
    require(dupes == 0L,
      s"asofJoin: right side has duplicate ($rightKeyCol, $rightTsCol) " +
        "rows — two states of one entity at one instant; deduplicate the " +
        "right side (e.g. keep the max-version row per key+ts), or pass " +
        "verifyUnique = false only when uniqueness is guaranteed upstream.")
    val lCols = left.columns
    // the dim payload rides ONE nullable struct (+ its own ts): a dim
    // row whose payload FIELDS are null still advances the match,
    // which per-column last(ignoreNulls) would get wrong
    val payload = struct(
      col(rightTsCol).as("_mts") +: payloadCols.map(c => col(c).as(c)): _*)
    val r = right
      .filter(col(rightTsCol).isNotNull && col(rightKeyCol).isNotNull)
      .select(col(rightKeyCol).as("_k"), col(rightTsCol).as("_ts"),
        lit(1).as("_dim"), payload.as("_p"))
    val l = left.select(
      col(leftKeyCol).as("_k") +: col(leftTsCol).as("_ts") +:
        lit(0).as("_dim") +: lit(null).cast(r.schema("_p").dataType).as("_p") +:
        lCols.map(c => left(c).as("_l_" + c)): _*)
    // dim rows sort BEFORE event rows at equal ts (_dim desc) under
    // EITHER ts ordering — exact matches count in every direction.
    // Window ordering is total per key: (ts, side) is unique on the dim
    // side by the contract above, and equal-ts event rows all read the
    // same carried state.
    def w(tsOrd: Column) = Window.partitionBy("_k")
      .orderBy(tsOrd, col("_dim").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = r
      .select((col("_k") +: col("_ts") +: col("_dim") +: col("_p") +:
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as("_l_" + c))): _*)
      .unionByName(l)
    // epoch-seconds difference: cast("long") is epoch for timestamp
    // columns and identity for numeric ts columns. Signed per side so
    // each candidate checks its own tolerance.
    def tolOk(m: Column, signedGap: Column): Column = toleranceSeconds match {
      case Some(t) => m.isNotNull && signedGap <= t
      case None    => m.isNotNull
    }
    def secs(c: Column) = c.cast("long")
    val withCands = direction match {
      case "backward" => all
        .withColumn("_mb", last(col("_p"), ignoreNulls = true)
          .over(w(col("_ts").asc)))
      case "forward" => all
        .withColumn("_mf", last(col("_p"), ignoreNulls = true)
          .over(w(col("_ts").desc)))
      case "nearest" => all
        .withColumn("_mb", last(col("_p"), ignoreNulls = true)
          .over(w(col("_ts").asc)))
        .withColumn("_mf", last(col("_p"), ignoreNulls = true)
          .over(w(col("_ts").desc)))
    }
    val matched = withCands.filter(col("_dim") === 0)
    val bOk = tolOk(col("_mb"),
      secs(col("_ts")) - secs(col("_mb").getField("_mts")))
    val fOk = tolOk(col("_mf"),
      secs(col("_mf").getField("_mts")) - secs(col("_ts")))
    // nearest compares EXACT distances (micros for timestamps, raw for
    // numerics — both sides are the same type, the union demands it);
    // ties to backward, the pandas convention
    def axis(c: Column): Column =
      if (left.schema(leftTsCol).dataType ==
          org.apache.spark.sql.types.TimestampType) unix_micros(c) else c
    val chosen = direction match {
      case "backward" => when(bOk, col("_mb"))
      case "forward"  => when(fOk, col("_mf"))
      case "nearest" =>
        val distB = axis(col("_ts")) - axis(col("_mb").getField("_mts"))
        val distF = axis(col("_mf").getField("_mts")) - axis(col("_ts"))
        when(bOk && fOk, when(distF < distB, col("_mf")).otherwise(col("_mb")))
          .when(bOk, col("_mb"))
          .when(fOk, col("_mf"))
    }
    val kept = matched.withColumn("_m", chosen)
    kept.select(
      lCols.map(c => col("_l_" + c).as(c)) ++
        Seq(col("_m").getField("_mts").as("matched_ts")) ++
        payloadCols.map(c => col("_m").getField(c).as(c)): _*)
  }

  /**
   * Regular-grid RESAMPLING with last-value carry-forward (pandas
   * `resample(...).last().ffill()`, the timeseries-DB `time_bucket` +
   * gap-fill): per key, an epoch-ALIGNED grid of `stepSeconds`-spaced
   * points spanning that key's [min ts, max ts] is generated and
   * as-of joined back to the events — each grid point carries the
   * latest observation at-or-before it (within `toleranceSeconds`, if
   * given — a sensor silent longer than the tolerance reads NULL, not
   * a stale value). Timestamps are handled in MICROSECONDS end to end
   * (events carry sub-second precision); the grid aligns to epoch
   * multiples of the step, not to each key's first event, so grids of
   * different keys and different runs line up.
   *
   * Output: (key, grid_us, matched_us, payload...) — one row per key
   * per grid point.
   *
   * Scale: the grid is generated per key from one min/max aggregate
   * (Σ span/step rows — grids are orders of magnitude smaller than
   * raw events at any realistic step) and the join is [[asofJoin]]'s
   * union-window: one hash shuffle per side. Events must be unique
   * per (key, ts) at microsecond precision (the asofJoin contract —
   * its loud refusal applies); pre-aggregate duplicates upstream.
   */
  def resampleLastValue(events: DataFrame, tsCol: String, keyCol: String,
                        payloadCols: Seq[String], stepSeconds: Long,
                        toleranceSeconds: Option[Long] = None): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    val ev = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("_ek") +: unix_micros(col(tsCol)).as("_eus") +:
        payloadCols.map(col): _*)
    // FLOOR-div epoch alignment (expr DIV truncates toward zero, wrong
    // for pre-1970 data — pmod-adjust keeps the grid aligned for any
    // sign): lo = greatest multiple of step <= min ts
    val lo = (col("_mn") - pmod(col("_mn"), lit(stepUs))).cast("long")
    val grid = ev.groupBy(col("_ek"))
      .agg(min(col("_eus")).as("_mn"), max(col("_eus")).as("_mx"))
      .select(col("_ek").as("_gk"),
        explode(sequence(lo, col("_mx"), lit(stepUs))).as("grid_us"))
    asofJoin(grid, "grid_us", "_gk", ev, "_eus", "_ek", payloadCols,
        toleranceSeconds = toleranceSeconds.map(_ * 1000000L))
      .withColumnRenamed("_gk", keyCol)
      .withColumnRenamed("matched_ts", "matched_us")
  }

  /**
   * Regular-grid resampling with LINEAR INTERPOLATION (pandas
   * `resample(...).interpolate()`, the timeseries-DB `interpolate`
   * gap-fill — the companion to [[resampleLastValue]] for continuous
   * signals): per key, the same epoch-aligned `stepSeconds` grid, but
   * each grid point reads the straight line between the latest
   * observation at-or-before it and the earliest at-or-after it:
   *
   *   value = prev_v + (next_v - prev_v) * (grid - prev_us) / (next_us - prev_us)
   *
   * Semantics (each pinned by the gate's oracle):
   *  - a grid point landing EXACTLY on an observation reads that
   *    observation (also what the formula degenerates to, but cased
   *    first so an exact hit at the corpus boundary — where one
   *    neighbour is missing — still reads its value);
   *  - NO extrapolation: grid points before a key's first observation
   *    or after its last read NULL (the grid spans [aligned min, max],
   *    so only the leading edge can actually lack a neighbour);
   *  - `maxGapSeconds` (the "don't invent a week of readings from two
   *    endpoints" knob) voids interpolation when the bracketing
   *    observations are further apart than the gap — value NULL, the
   *    bracket timestamps still reported.
   *
   * Output: (key, grid_us, prev_us, next_us, value) — the bracket is
   * reported as data, so a consumer can audit WHICH observations each
   * interpolated reading came from.
   *
   * Determinism: the interpolation expression is the exact parse tree
   * above — `((next_v - prev_v) * double(grid - prev_us)) / double(next_us
   * - prev_us)` added to `prev_v` — all IEEE-754 double ops, so any
   * engine evaluating the same tree reproduces it bit-for-bit (the gate
   * hashes raw doubles, no rounding).
   *
   * Scale: two [[asofJoin]] union-windows (backward, then forward on the
   * NEGATED time axis — a forward as-of IS a backward as-of on reversed
   * time), each one hash shuffle per side; the grid is Σ span/step rows
   * from one min/max aggregate. Events must be unique per (key, ts) at
   * microsecond precision (asofJoin's loud refusal applies; the second
   * join skips the re-verify — same frame, already checked).
   */
  def resampleInterpolate(events: DataFrame, tsCol: String, keyCol: String,
                          valueCol: String, stepSeconds: Long,
                          maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be > 0, got $stepSeconds")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be > 0")
    val stepUs = stepSeconds * 1000000L
    val ev = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("_ek"), unix_micros(col(tsCol)).as("_eus"),
        col(valueCol).cast("double").as("_pv"))
    val lo = (col("_mn") - pmod(col("_mn"), lit(stepUs))).cast("long")
    val grid = ev.groupBy(col("_ek"))
      .agg(min(col("_eus")).as("_mn"), max(col("_eus")).as("_mx"))
      .select(col("_ek").as("_gk"),
        explode(sequence(lo, col("_mx"), lit(stepUs))).as("grid_us"))
    val back = asofJoin(grid, "grid_us", "_gk", ev, "_eus", "_ek", Seq("_pv"))
      .withColumnRenamed("matched_ts", "prev_us")
    val evFwd = ev.select(col("_ek"), (-col("_eus")).as("_nus"),
      col("_pv").as("_nv"))
    val fwd = asofJoin(back.withColumn("_ng", -col("grid_us")), "_ng", "_gk",
        evFwd, "_nus", "_ek", Seq("_nv"), verifyUnique = false)
      .withColumn("next_us", -col("matched_ts"))
    val gapOk = maxGapSeconds match {
      case Some(g) => col("next_us") - col("prev_us") <= g * 1000000L
      case None    => lit(true)
    }
    val interp = col("_pv") + (col("_nv") - col("_pv")) *
      (col("grid_us") - col("prev_us")).cast("double") /
      (col("next_us") - col("prev_us")).cast("double")
    fwd.select(col("_gk").as(keyCol), col("grid_us"), col("prev_us"),
      col("next_us"),
      when(col("prev_us") === col("grid_us"), col("_pv"))
        .when(col("prev_us").isNotNull && col("next_us").isNotNull && gapOk,
          interp)
        .as("value"))
  }

  /**
   * Funnel analysis (the Amplitude/Mixpanel sequence primitive): per
   * key, the earliest strictly-ordered completion of the step sequence
   * — `t1` = the key's first `steps(0)` event, `t_i` = its first
   * `steps(i-1)` event STRICTLY AFTER `t_{i-1}` (strict, so repeated
   * step types need distinct events), optionally bounded by
   * `windowSeconds` from `t1` (the "convert within N days" clause).
   * Greedy-earliest is the standard semantics and is optimal here: for
   * a fixed completion deadline, taking each step as early as possible
   * never excludes a completable suffix.
   *
   * Output: one row per key that performed step 1 at all — step
   * timestamps `t1_us..tk_us` (micros, NULL once the funnel stalls)
   * and `steps_completed`. Keys that never did step 1 are absent (the
   * funnel-entry convention: denominators come from step-1 counts).
   *
   * Scale: k-1 rounds of (slim equi-join on key + map-side-combined
   * min aggregate) over the (key, ts) projection — never a per-key
   * collect, never a sort of the event stream; funnels are 3-7 steps,
   * so the round count is a small constant. Per-round frames carry one
   * row per surviving key.
   */
  def funnel(events: DataFrame, tsCol: String, keyCol: String,
             typeCol: String, steps: Seq[String],
             windowSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(windowSeconds.forall(_ > 0), "windowSeconds must be > 0")
    val ev = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(keyCol).as("_k"), unix_micros(col(tsCol)).as("_us"),
        col(typeCol).as("_t"))
    var cur = ev.filter(col("_t") === steps.head)
      .groupBy(col("_k")).agg(min(col("_us")).as("t1_us"))
    steps.indices.drop(1).foreach { i =>
      val prevCol = s"t${i}_us"
      val deadline = windowSeconds.map(w =>
        col("_us") <= col("t1_us") + w * 1000000L)
      val next = ev.filter(col("_t") === steps(i))
        .join(cur.select(("_k" +: (1 to i).map(j => s"t${j}_us")).map(col): _*),
          Seq("_k"))
        .filter(deadline.foldLeft(col("_us") > col(prevCol))(_ && _))
        .groupBy(col("_k")).agg(min(col("_us")).as(s"t${i + 1}_us"))
      cur = cur.join(next, Seq("_k"), "left")
    }
    val tCols = (1 to steps.length).map(j => col(s"t${j}_us"))
    cur.select(col("_k").as(keyCol) +: tCols :+
      tCols.map(c => when(c.isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int").as("steps_completed"): _*)
  }

  /**
   * SCD2 INTERVALIZATION (the dimension-builder dual of [[asofJoin]]):
   * point-in-time snapshots become validity intervals — the
   * slowly-changing-dimension type-2 table every warehouse keeps. Per
   * key, snapshots ordered by time open an interval at their own
   * timestamp and close at the NEXT snapshot's (half-open
   * [valid_from, valid_to), the merge-friendly convention); the last
   * interval is open-ended (`valid_to_us` NULL = current).
   *
   * `compact = true` (default) first collapses CHANGE-FREE runs: a
   * snapshot whose payload equals the previous snapshot's payload
   * extends the previous interval instead of opening a redundant one —
   * the dedup that makes daily full snapshots storable as SCD2.
   * Equality is null-safe per column (a (NULL→NULL) run compacts, a
   * (1→NULL) run does not); the first snapshot of a key always opens.
   *
   * Contract: snapshots must be unique per (key, ts) — same refusal as
   * [[asofJoin]]'s right side, verified with one aggregate
   * (`verifyUnique = false` to skip when guaranteed upstream).
   * Timestamps are microseconds end-to-end (`unix_micros`).
   *
   * Output: (key, valid_from_us, valid_to_us, payload...).
   *
   * Scale: one hash shuffle on the key; both windows (change-detect lag,
   * close-interval lead) share the same partitioning+ordering, so
   * Catalyst plans ONE exchange + ONE sort. Per-key work is a
   * sequential scan of that key's snapshot history.
   */
  def scd2(snapshots: DataFrame, tsCol: String, keyCol: String,
           payloadCols: Seq[String], compact: Boolean = true,
           verifyUnique: Boolean = true): DataFrame = {
    require(payloadCols.nonEmpty, "scd2: need at least one payload column")
    import org.apache.spark.sql.expressions.Window
    val snap = snapshots
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("_k") +: unix_micros(col(tsCol)).as("_us") +:
        payloadCols.map(col): _*)
    val dupes =
      if (!verifyUnique) 0L
      else snap.groupBy(col("_k"), col("_us"))
        .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
        .limit(1).count()
    require(dupes == 0L,
      s"scd2: duplicate ($keyCol, $tsCol) snapshots — two states of one " +
        "entity at one instant; deduplicate upstream (e.g. keep the " +
        "max-version row), or pass verifyUnique = false only when " +
        "uniqueness is guaranteed upstream.")
    val w = Window.partitionBy("_k").orderBy(col("_us").asc)
    val kept =
      if (!compact) snap
      else {
        // payload rides one struct so a lag over it is null ONLY on the
        // first row of a key (per-column lag can't tell "first row"
        // from "previous value was NULL")
        val p = struct(payloadCols.map(col): _*)
        snap.withColumn("_prev", lag(p, 1).over(w))
          .filter(col("_prev").isNull || !(col("_prev") <=> p))
          .drop("_prev")
      }
    kept
      .withColumn("valid_to_us", lead(col("_us"), 1).over(w))
      .select(col("_k").as(keyCol) +: col("_us").as("valid_from_us") +:
        col("valid_to_us") +: payloadCols.map(col): _*)
  }

  /**
   * SCD2 POINT-IN-TIME LOOKUP — the one-call composition of [[scd2]]
   * and [[asofJoin]]: join each fact row to the dimension VERSION valid
   * at fact time, i.e. the interval with `valid_from <= ts AND
   * (valid_to IS NULL OR ts < valid_to)` (half-open, NULL = current —
   * exactly [[scd2]]'s output convention). The implementation is a
   * keyed backward as-of against `valid_from` with `valid_to` carried
   * as payload and verified after — NOT a range join: per (key, ts) at
   * most one version can match, which is precisely the as-of shape (one
   * hash shuffle per side, zero interval explosion). The `valid_to`
   * verify only bites when the interval table has GAPS (a deleted
   * period); [[scd2]]'s tiled output passes it by construction.
   *
   * Facts with no valid version (before the key's first interval, or in
   * a gap) keep their row with NULL interval/payload columns — a left
   * join, the [[asofJoin]] contract.
   *
   * Fact timestamps may be TIMESTAMP (converted to the interval table's
   * microsecond axis via `unix_micros`) or already-numeric micros.
   * `dims` must be unique per (key, valid_from) — [[asofJoin]]'s loud
   * refusal applies (`verifyUnique = false` to skip when the producer
   * is [[scd2]] itself, which guarantees it).
   *
   * Output: facts' columns ++ (valid_from_us, valid_to_us, payload...).
   */
  def scd2Lookup(facts: DataFrame, factTsCol: String, factKeyCol: String,
                 dims: DataFrame, dimKeyCol: String,
                 payloadCols: Seq[String],
                 validFromCol: String = "valid_from_us",
                 validToCol: String = "valid_to_us",
                 verifyUnique: Boolean = true): DataFrame = {
    val clash = facts.columns.toSet
      .intersect(payloadCols.toSet + validFromCol + validToCol)
    require(clash.isEmpty,
      s"scd2Lookup: output would carry duplicate column names " +
        s"${clash.mkString(", ")} — the fact frame already has them; " +
        "rename one side")
    val fts =
      if (facts.schema(factTsCol).dataType ==
          org.apache.spark.sql.types.TimestampType)
        unix_micros(col(factTsCol))
      else col(factTsCol).cast("long")
    val f = facts.withColumn("_fus", fts)
    val joined = asofJoin(f, "_fus", factKeyCol,
      dims, validFromCol, dimKeyCol,
      payloadCols = validToCol +: payloadCols,
      verifyUnique = verifyUnique)
    // half-open verify: a match whose interval CLOSED before the fact
    // (possible only with gapped interval tables) is voided, row kept
    val in = col("matched_ts").isNotNull &&
      (col(validToCol).isNull || col("_fus") < col(validToCol))
    joined.select(
      facts.columns.map(c => col(c)) ++
        Seq(when(in, col("matched_ts")).as(validFromCol),
          when(in, col(validToCol)).as(validToCol)) ++
        payloadCols.map(c => when(in, col(c)).as(c)): _*)
  }

  /**
   * Cohort RETENTION (the companion primitive to [[funnel]]): keys are
   * cohorted by the epoch-aligned period of their FIRST event, and cell
   * (cohort_period, period_offset) counts the distinct keys with ANY
   * event `offset` periods after their cohort period — the classic
   * retention triangle. Period indices are epoch-aligned integer
   * buckets (floor division, sign-safe), so cohorts line up across runs
   * and engines.
   *
   * Scale: one slim min-aggregate per key, one equi-join back on the
   * key, one distinct-count aggregate whose shuffle carries
   * (cohort, offset, key) slim rows — nothing holds per-key history.
   */
  def retention(events: DataFrame, tsCol: String, keyCol: String,
                periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, s"periodSeconds must be > 0, got $periodSeconds")
    val pUs = periodSeconds * 1000000L
    val us = unix_micros(col(tsCol))
    val ev = events.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("_k"),
        ((us - pmod(us, lit(pUs))) / pUs).cast("long").as("_p"))
    val first = ev.groupBy(col("_k")).agg(min(col("_p")).as("_c"))
    ev.join(first, Seq("_k"))
      .groupBy(col("_c").as("cohort_period"),
        (col("_p") - col("_c")).as("period_offset"))
      .agg(countDistinct(col("_k")).as("n_users"))
  }
}
