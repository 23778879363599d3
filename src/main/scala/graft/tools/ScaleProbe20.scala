package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scale probes for the trajectory-compression / OD-matrix
  * wave. Measurement only.
  *
  *  1. compress (planar DP): 1x vs 10x keys at fixed 100-point tracks
  *     — the per-key DP is O(n²) worst-case but n is per-key; keys
  *     hash-partition, so wall must track the KEY count linearly, like
  *     the stayPoints/mapMatch scan family it shares plumbing with.
  *  2. compress: track-length stress at fixed total rows — 10k keys ×
  *     1000 points vs 100k keys × 100 points: same row count, deeper
  *     per-key recursion; a superlinear per-key term would show here.
  *  3. compressGeo vs compress at the same shape — the chord-space
  *     lift is 5 trig calls per point, so the geodesic premium must be
  *     a small constant factor on the same scan.
  *  4. odMatrix: 1x vs 10x points — two map-side-combinable aggregates
  *     (per-key endpoints, then OD-pair counts), so wall must track
  *     the input scan; the output is |distinct OD pairs|, constant
  *     here.
  */
object ScaleProbe20 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time3(label: String)(df: => DataFrame): Unit = {
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val d = df
        val r = d.select(count(lit(1)).as("n"),
          bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      println(f"SCALE20 $label%-44s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    // synthetic tracks: nKeys keys × ptsPerKey points, zig-zag with a
    // key-dependent amplitude so kept fractions vary per key
    def tracks(nKeys: Long, ptsPerKey: Int): DataFrame =
      spark.range(nKeys * ptsPerKey).select(
        (col("id") / ptsPerKey).cast("long").as("k"),
        pmod(col("id"), lit(ptsPerKey)).cast("long").as("t"),
        (pmod(col("id"), lit(ptsPerKey)) * 10).cast("double").as("x"),
        (pmod(col("id") * 37 + col("id") / ptsPerKey, lit(97)))
          .cast("double").as("y"))

    for (n <- Seq(100000L, 1000000L))
      time3(s"compress ${n / 1000}k keys x 100 pts, tol=20") {
        graft.core.Trajectory.compress(tracks(n, 100), "k", "t", "x", "y",
          tolerance = 20.0)
      }
    time3("compress 10k keys x 1000 pts (same rows)") {
      graft.core.Trajectory.compress(tracks(10000L, 1000), "k", "t", "x",
        "y", tolerance = 20.0)
    }

    // geodesic twin at the same shape: scale the zig-zag into a ~1-deg
    // lon/lat patch so coordinates stay in range
    def geoTracks(nKeys: Long, ptsPerKey: Int): DataFrame =
      spark.range(nKeys * ptsPerKey).select(
        (col("id") / ptsPerKey).cast("long").as("k"),
        pmod(col("id"), lit(ptsPerKey)).cast("long").as("t"),
        (pmod(col("id"), lit(ptsPerKey)) * 0.001).cast("double").as("lon"),
        (pmod(col("id") * 37 + col("id") / ptsPerKey, lit(97)) * 0.0005)
          .cast("double").as("lat"))
    time3("compressGeo 1000k keys x 100 pts, tol=2km") {
      graft.core.Trajectory.compressGeo(geoTracks(1000000L, 100), "k", "t",
        "lon", "lat", toleranceMeters = 2000.0)
    }

    // odMatrix scaling: same synthetic points, z=6
    def odPts(n: Long): DataFrame =
      spark.range(n).select(
        pmod(col("id"), lit(200000)).cast("long").as("k"),
        col("id").as("t"),
        (pmod(col("id") * 13, lit(3200)).cast("double") / 10.0 - 160.0 + 0.05)
          .as("lon"),
        (pmod(col("id") * 7, lit(1500)).cast("double") / 10.0 - 75.0 + 0.05)
          .as("lat"))
    for (n <- Seq(1000000L, 10000000L))
      time3(s"odMatrix ${n / 1000000}M pts, 200k keys, z=6") {
        graft.core.Trajectory.odMatrix(odPts(n), "k", "t", "lon", "lat",
          zoom = 6)
      }

    println("SCALE20_DONE")
    spark.stop()
  }
}
