package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scale probes for the map-matching + geodesic-hotspot wave.
  * Measurement only.
  *
  *  1. mapMatch: 1x vs 10x keys (tracks), fixed 8 pings x 3 candidates
  *     — the per-key DP is O(T·K²) and keys hash-partition, so wall
  *     must track the key count (embarrassingly parallel scan).
  *  2. mapMatch: candidate-width stress at fixed keys — K=3 vs K=12:
  *     the DP term is K², but candidate rows grow only K·T — wall
  *     should grow far slower than K² because the scan is IO-bound at
  *     these widths.
  *  3. hotspotsGeo: 1x vs 10x points — one map-side-combinable
  *     groupBy + a ≤9-way slim explode over OCCUPIED CELLS (a
  *     near-constant of the fixture), so wall must track the input
  *     scan, not the cell math.
  *  4. Tiles.coverGeometry planning cost: L-shaped mask at z=10..14,
  *     driver-side — must stay in the low milliseconds (it runs once
  *     per query plan).
  */
object ScaleProbe19 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time3(label: String)(df: => DataFrame): Unit = {
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val d = df
        val r = d.select(count(lit(1)).as("n"),
          bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      println(f"SCALE19 $label%-44s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    // ---- 1+2. mapMatch scaling --------------------------------------
    def cands(nKeys: Long, nCand: Int): DataFrame =
      spark.range(nKeys).select(col("id").as("k"))
        .select(col("k"), explode(array((0 until 8).map(i => lit(i.toLong)): _*)).as("t"))
        .select(col("k"), col("t"),
          explode(array((1 to nCand).map(i => lit(i.toLong)): _*)).as("c"))
        .select(col("k"), col("t"), col("c"),
          (pmod(col("k") * 7 + col("t") * 3 + col("c") * 5, lit(11))
            .cast("double") + 1.0).as("d"),
          (col("t").cast("double") * 9.0).as("px"),
          (pmod(col("k"), lit(40)).cast("double")).as("py"),
          (col("t").cast("double") * 9.0).as("sx"),
          ((col("c") - 1).cast("double") * 8.0).as("sy"))
    def mm(nKeys: Long, nCand: Int): DataFrame =
      graft.core.Trajectory.mapMatch(cands(nKeys, nCand),
        "k", "t", "c", "d", "px", "py", "sx", "sy", 2.0, 1.0)
    time3("mapMatch 30k keys x 8 pings x 3 cand")(mm(30000, 3))
    time3("mapMatch 300k keys x 8 pings x 3 cand")(mm(300000, 3))
    time3("mapMatch 3M keys x 8 pings x 3 cand")(mm(3000000, 3))
    time3("mapMatch 30k keys x 8 pings x 12 cand")(mm(30000, 12))

    // ---- 3. hotspotsGeo scaling -------------------------------------
    def pts(n: Long): DataFrame = spark.range(n).select(
      (pmod(xxhash64(col("id")), lit(355200)).cast("double") / 1000.0
        - 177.6 + 0.37).as("lon"),
      (pmod(xxhash64(col("id") + 7), lit(130000)).cast("double") / 1000.0
        - 65.0 + 0.29).as("lat"))
    def hg(n: Long): DataFrame =
      graft.core.GeoCluster.hotspotsGeo(pts(n), "lon", "lat", 700000.0)
    time3("hotspotsGeo 1M global points")(hg(1000000L))
    time3("hotspotsGeo 10M global points")(hg(10000000L))

    // ---- 4. coverGeometry planning cost -----------------------------
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    def poly(ptsL: (Double, Double)*) = gf.createPolygon(
      (ptsL :+ ptsL.head).map { case (x, y) =>
        new org.locationtech.jts.geom.Coordinate(x, y) }.toArray)
    val l = poly((10.25, -40.25), (90.25, -40.25), (90.25, -20.25),
      (30.25, -20.25), (30.25, 50.25), (10.25, 50.25))
    for (z <- Seq(10, 12, 14); budget <- Seq(64, 256)) {
      val t0 = System.nanoTime()
      val cov = graft.core.Tiles.coverGeometry(l, z, budget)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"SCALE19 coverGeometry z=$z budget=$budget -> ${cov.size}%4d prefixes in $ms%.1f ms")
    }
    spark.stop()
    println("SCALE19_DONE")
  }
}
