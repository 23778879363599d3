package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 probes for the SPATIAL-JOIN / DBSCAN family (the
  * ScaleProbe13 recipe). Measurement only — gates never read these.
  *
  *  1. pointJoin vs the BroadcastNestedLoopJoin Spark would otherwise
  *     plan (crossJoin + st_relation filter) — the algorithmic win at
  *     the scale where brute force is still runnable, then the grid at
  *     10x points where brute force is 10x that.
  *  2. pointJoin points-side linearity: fixed polygon layer, points
  *     1x vs 10x — the 100 TB shape is points >> polygons, so time
  *     must track the points side.
  *  3. spatialJoin both-sides 10x (pairs grow ~100x at fixed geometry
  *     density — output-bound, like every pair-producing join).
  *  4. geoDbscan at CONSTANT linear density (centers fixed, line slots
  *     scale with N so occupancy stays ~2/3): eps-graph, cores, CC and
  *     border attach must all track N, not N².
  */
object ScaleProbe14 {

  def main(args: Array[String]): Unit = {
    val only = args.toSet
    def want(label: String): Boolean =
      only.isEmpty || only.exists(label.contains)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.registerAll(spark)
    import graft.functions.GeoFunctions._

    def time3(label: String)(df: => DataFrame): Unit = {
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val d = df
        val r = d.select(count(lit(1)).as("n"),
          bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      println(f"SCALE14 $label%-36s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    // synthetic layers on a [0, side)^2 plane at FIXED geometry density
    def tris(n: Long, side: Double, seed: Int): DataFrame = {
      val ax = pmod(xxhash64(col("id") + seed), lit(1000000)).cast("double") / 1e6 * side
      val ay = pmod(xxhash64(col("id") + seed + 7), lit(1000000)).cast("double") / 1e6 * side
      spark.range(n).select(col("id").as("gid"),
        st_geomfromtext(concat(lit("POLYGON(("),
          ax.cast("string"), lit(" "), ay.cast("string"), lit(", "),
          (ax + 30).cast("string"), lit(" "), ay.cast("string"), lit(", "),
          ax.cast("string"), lit(" "), (ay + 30).cast("string"), lit(", "),
          ax.cast("string"), lit(" "), ay.cast("string"), lit("))"))).as("geom"))
    }
    def pts(n: Long, side: Double, seed: Int): DataFrame =
      spark.range(n).select(col("id").as("pid"),
        (pmod(xxhash64(col("id") + seed), lit(1000000)).cast("double")
          / 1e6 * side).as("px"),
        (pmod(xxhash64(col("id") + seed + 3), lit(1000000)).cast("double")
          / 1e6 * side).as("py"))

    if (want("pointJoin")) {
      // ~2k polygons on a 4000-side plane; 100k vs 1M points. The
      // brute twin runs on a 10k-point SAMPLE (2k x 100k is 200M JTS
      // calls per run — the point of the probe) and its time is read
      // x10 for the 100k comparison.
      val g = tris(2000, 4000.0, 11).localCheckpoint(true)
      val p01 = pts(10000, 4000.0, 5).localCheckpoint(true)
      val p1 = pts(100000, 4000.0, 5).localCheckpoint(true)
      val p10 = pts(1000000, 4000.0, 5).localCheckpoint(true)
      time3("pointJoin brute BNLJ 10k")(
        g.crossJoin(p01).filter(st_relation("intersects", col("geom"),
          st_point(col("px"), col("py")))).select("gid", "pid"))
      time3("pointJoin grid 100k")(
        graft.core.SpatialJoin.pointJoin(g, "geom", p1, "px", "py",
          "intersects", cellSize = 30.0).select("gid", "pid"))
      time3("pointJoin grid 1M")(
        graft.core.SpatialJoin.pointJoin(g, "geom", p10, "px", "py",
          "intersects", cellSize = 30.0).select("gid", "pid"))
    }

    if (want("spatialJoin")) {
      def rects(n: Long, side: Double, seed: Int, w: Double, h: Double): DataFrame = {
        val x = pmod(xxhash64(col("id") + seed), lit(1000000)).cast("double") / 1e6 * side
        val y = pmod(xxhash64(col("id") + seed + 9), lit(1000000)).cast("double") / 1e6 * side
        spark.range(n).select(col("id").as(s"id$seed"),
          st_makeenvelope(x, y, x + w, y + h).as(s"geom$seed"))
      }
      // both sides 10x on the SAME plane: density 10x each side, so the
      // pair count grows ~100x — the probe pins output-boundedness
      val a1 = rects(20000, 10000.0, 21, 40, 25).localCheckpoint(true)
      val b1 = rects(20000, 10000.0, 22, 15, 35).localCheckpoint(true)
      val a10 = rects(200000, 10000.0, 21, 40, 25).localCheckpoint(true)
      val b10 = rects(200000, 10000.0, 22, 15, 35).localCheckpoint(true)
      time3("spatialJoin 20k x 20k")(
        graft.core.SpatialJoin.spatialJoin(a1, "geom21", b1, "geom22",
          "intersects", cellSize = 50.0).select("id21", "id22"))
      time3("spatialJoin 200k x 200k")(
        graft.core.SpatialJoin.spatialJoin(a10, "geom21", b10, "geom22",
          "intersects", cellSize = 50.0).select("id21", "id22"))
    }

    if (want("dbscan")) {
      // the q226 shape at constant linear density: 77 meridian lines,
      // slots scale with N so occupancy stays ~2/3 — neighbor counts
      // (and so per-point work) stay constant while N grows 10x
      def cloud(n: Long, slots: Int): DataFrame =
        spark.range(1, n + 1).select(col("id"),
          (((col("id") % 77) % 7).cast("double") * 12 - 36 +
            (col("id") % slots).cast("double") * 0.004).as("lat"),
          (expr("(id % 77) div 7").cast("double") * 24 - 120).as("lon"))
      time3("geoDbscan 15k pts")(
        graft.core.GeoCluster.geoDbscan(cloud(15000, 290), "id",
          "lat", "lon", 2000.0, 4).select("id", "is_core", "cluster"))
      time3("geoDbscan 150k pts")(
        graft.core.GeoCluster.geoDbscan(cloud(150000, 2900), "id",
          "lat", "lon", 2000.0, 4).select("id", "is_core", "cluster"))
    }

    spark.stop()
  }
}
