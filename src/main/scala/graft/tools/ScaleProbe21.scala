package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 scale probes (VERDICT r15 #7): the two big r15 rewrites at
  * 10M+ rows and under skew — sf0.1's ~600k-row fixtures cannot show
  * the shuffle-volume story the 100 TB brief is about. Measurement
  * only.
  *
  *  1. pointInIntervalSumExact: 10M points × 20k bands (200 of them
  *     WIDE — 5000 bins each at binWidth 100) — the fused wide path
  *     must scale with |occupied bins| + |edge-bin rows|, never with
  *     |points|·|wide| (the unfused BroadcastNLJ pair stream). Also
  *     the r16 regression case: ONE outlier point a billion bins away
  *     (the old explode(sequence) clamp would have built ~1e9-element
  *     arrays per wide interval; the occupied-bin range join must not
  *     care).
  *  2. pointInIntervalSumExact skew: all 10M points in ONE bin (every
  *     wide interval's interior covers it) — the per-bin pre-aggregate
  *     is a map-side-combinable groupBy, so the hot bin must cost one
  *     reduce task's merge, not a 10M-row explode.
  *  3. spaceTimeJoin rebalance: 10M right × 1M left co-location,
  *     before-shape (27|R| exchanged rows) vs after-shape (9|R|+3|L|)
  *     is a code constant now — probe the ABSOLUTE exchange volume by
  *     comparing matched-pair-equal configs at 1x and 10x rows: wall
  *     must track rows near-linearly and the SQL metrics' shuffle
  *     bytes must sit near 9R+3L row counts.
  */
object ScaleProbe21 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.RangeJoin

    def time3(label: String)(df: => DataFrame): Unit = {
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val d = df
        val r = d.select(count(lit(1)).as("n"),
          bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      println(f"SCALE21 $label%-48s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    // ---- 1. fused exact range-aggregate at 10M x 20k (200 wide) ----
    def points(n: Long): DataFrame = spark.range(n).select(
      (col("id") % 1000000L).cast("double").as("x"))
    def bands(nB: Long): DataFrame = spark.range(nB).select(
      col("id").as("band_id"),
      (col("id") % 10000L).cast("double").as("lo"),
      ((col("id") % 10000L).cast("double") +
        when(col("id") % 100 === 0, 500000.0).otherwise(50.0)).as("hi"))
    def fused(p: DataFrame, b: DataFrame) =
      RangeJoin.pointInIntervalSumExact(p, "x", b, "lo", "hi",
        binWidth = 100.0, groupCols = Seq("band_id"), scale = 6,
        outName = "sum_x", maxWideIntervals = 100000)
    time3("sumExact 1M pts x 2k bands (20 wide)")(
      fused(points(1000000L), bands(2000L)))
    time3("sumExact 10M pts x 20k bands (200 wide)")(
      fused(points(10000000L), bands(20000L)))
    // outlier: one point at x = 1e11 stretches the occupied-bin RANGE
    // to ~1e9 bins; the r16 occupied-bin range join must be unmoved
    time3("sumExact 10M pts + 1e11 outlier x 20k bands")(
      fused(points(10000000L)
        .unionByName(spark.range(1).select(lit(1.0e11).as("x"))),
        bands(20000L)))
    // ---- 2. hot-bin skew: all 10M points in one bin ----
    time3("sumExact 10M pts ONE bin x 2k bands (20 wide)")(
      fused(spark.range(10000000L).select(
        (col("id") % 100L).cast("double").as("x")), bands(2000L)))

    // ---- 3. spaceTimeJoin at 1x and 10x ----
    def side(n: Long, salt: Int, pre: String): DataFrame =
      spark.range(n).select(
        col("id").as(s"${pre}_id"),
        ((col("id") * salt) % 1000L).cast("double").as(s"${pre}x"),
        ((col("id") * (salt + 2)) % 1000L).cast("double").as(s"${pre}y"),
        ((col("id") * (salt + 4)) % 5000L).cast("double").as(s"${pre}t"))
    def stj(nL: Long, nR: Long) = graft.core.DistanceJoin.spaceTimeJoin(
      side(nL, 29, "l"), side(nR, 31, "r"),
      "lx", "ly", "lt", "rx", "ry", "rt", radius = 2.0, tau = 5.0)
      .select(col("l_id"), col("r_id"))
    time3("spaceTime 100k x 1M")(stj(100000L, 1000000L))
    time3("spaceTime 1M x 10M")(stj(1000000L, 10000000L))

    spark.stop()
  }
}
