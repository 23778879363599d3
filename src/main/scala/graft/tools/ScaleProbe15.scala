package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 probes for the GRAPH / BROADCAST-JOIN / SEGMENT-SNAP
  * family (the ScaleProbe13/14 recipe). Measurement only.
  *
  *  1. broadcastPointJoin vs pointJoin on the same big-points x
  *     small-polygons fixture, points 1x vs 10x — the broadcast path
  *     must win (zero point shuffle) and both must track the points
  *     side linearly.
  *  2. pageRank edges 1x vs 10x at fixed iteration count — per-round
  *     cost must track the edge table (slim-frame joins), not N².
  *  3. triangleCounts on a dense graph 1x vs 4x edges — wedge
  *     intermediate is the cost driver; the degree orientation keeps
  *     it Σ outdeg², measured against the hub-free bound.
  *  4. snapToSegments points 1x vs 10x over a fixed road layer —
  *     round-1 resolution dominates at realistic density, so time
  *     tracks the points side.
  */
object ScaleProbe15 {

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
      println(f"SCALE15 $label%-36s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    // ---- 1. broadcast vs grid point join: 2k triangles, 150k/1.5M pts
    def tris(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("gid"),
        st_geomfromtext(concat(lit("POLYGON(("),
          ((col("id") * 13) % 4000).cast("string"), lit(" "),
          ((col("id") * 29) % 4000).cast("string"), lit(", "),
          ((col("id") * 13) % 4000 + 45).cast("string"), lit(" "),
          ((col("id") * 29) % 4000).cast("string"), lit(", "),
          ((col("id") * 13) % 4000).cast("string"), lit(" "),
          ((col("id") * 29) % 4000 + 45).cast("string"), lit(", "),
          ((col("id") * 13) % 4000).cast("string"), lit(" "),
          ((col("id") * 29) % 4000).cast("string"), lit("))"))).as("g"))
    def pts(n: Long): DataFrame =
      spark.range(n).select(col("id").as("pid"),
        ((col("id") * 7) % 4000).cast("double").as("px"),
        ((col("id") * 23) % 4000).cast("double").as("py"))
    val layer = tris(2000).localCheckpoint()
    for (n <- Seq(1500000L, 15000000L)) {
      val p = pts(n).localCheckpoint()
      if (want("grid_pj")) time3(s"grid_pj_pts${n / 1000}k") {
        graft.core.SpatialJoin.pointJoin(layer, "g", p, "px", "py",
          "intersects", cellSize = 45.0).select("gid", "pid")
      }
      if (want("bcast_pj")) time3(s"bcast_pj_pts${n / 1000}k") {
        graft.core.SpatialJoin.broadcastPointJoin(layer, "g", p, "px", "py",
          "intersects").select("gid", "pid")
      }
    }

    // ---- 2. pageRank 1x vs 10x edges (hash-drawn endpoints — a
    // modulus fixture would repeat with period `nodes` and cap the
    // distinct edge set)
    def edges(m: Long, nodes: Long): DataFrame =
      spark.range(m).select(
        pmod(xxhash64(col("id"), lit(1)), lit(nodes)).as("src"),
        pmod(xxhash64(col("id"), lit(2)), lit(nodes)).as("dst"))
    for ((m, n) <- Seq((100000L, 20000L), (1000000L, 200000L))) {
      val e = edges(m, n).localCheckpoint()
      if (want("pagerank")) time3(s"pagerank_e${m / 1000}k_i4") {
        graft.ext.Graph.pageRank(e, iters = 4)
      }
    }

    // ---- 3. triangleCounts 1x vs 4x edges on a dense 3k-node graph
    for (m <- Seq(150000L, 600000L)) {
      val e = edges(m, 3000L).localCheckpoint()
      if (want("triangles")) time3(s"triangles_e${m / 1000}k") {
        graft.ext.Graph.triangleCounts(e)
      }
    }

    // ---- 2b. shortestPaths: 5 rounds, edges 1x vs 10x
    for ((m, n) <- Seq((100000L, 20000L), (1000000L, 200000L))) {
      val e = edges(m, n).withColumn("w",
        pmod(xxhash64(col("src"), col("dst")), lit(50L)) + 1L).localCheckpoint()
      if (want("sssp")) time3(s"sssp_e${m / 1000}k_r5") {
        graft.ext.Graph.shortestPaths(e, wCol = Some("w"),
          sourceId = 0L, rounds = 5)
      }
    }

    // ---- 2c. coOccurrence: bipartite docs x terms, edges 1x vs 10x at
    // fixed term vocabulary (pairs grow with shared-doc density)
    for (m <- Seq(200000L, 2000000L)) {
      val e = spark.range(m).select(
        pmod(xxhash64(col("id"), lit(3)), lit(m / 10)).as("src"),
        pmod(xxhash64(col("id"), lit(4)), lit(2000L)).as("dst"))
        .localCheckpoint()
      if (want("cooc")) time3(s"cooc_e${m / 1000}k") {
        graft.ext.Graph.coOccurrence(e)
      }
    }

    // ---- 2d. tile aggregation: quadkey z=10 groupBy, points 1x vs 10x
    for (n <- Seq(1500000L, 15000000L)) {
      val p = spark.range(n).select(
        (pmod(xxhash64(col("id"), lit(5)), lit(140000L)).cast("double") / 1000.0
          - 70.0 + 0.0005).as("lat"),
        (pmod(xxhash64(col("id"), lit(6)), lit(360000L)).cast("double") / 1000.0
          - 180.0 + 0.0005).as("lon")).localCheckpoint()
      if (want("tiles")) time3(s"tiles_pts${n / 1000}k_z10") {
        p.select(graft.core.Tiles.quadkey(col("lon"), col("lat"), 10).as("qk"))
          .groupBy("qk").agg(count(lit(1)).as("n"))
      }
    }

    // ---- 4. snapToSegments: fixed 5k-road layer, points 1x vs 10x
    val roads = spark.range(5000L).select(col("id").as("sid"),
      ((col("id") * 13) % 4000).cast("double").as("ax"),
      ((col("id") * 29) % 4000).cast("double").as("ay"),
      (((col("id") * 13) % 4000) +
        when(col("id") % 2 === 0, 60).otherwise(0)).cast("double").as("bx"),
      (((col("id") * 29) % 4000) +
        when(col("id") % 2 === 0, 0).otherwise(60)).cast("double").as("by"))
      .localCheckpoint()
    for (n <- Seq(150000L, 1500000L)) {
      val p = pts(n).localCheckpoint()
      if (want("snap")) time3(s"snap_pts${n / 1000}k") {
        graft.core.DistanceJoin.snapToSegments(p, roads, "px", "py",
          "ax", "ay", "bx", "by", "sid", startRadius = 40.0,
          maxRadius = 640.0, lIdCol = Some("pid")).select("pid", "sid")
      }
    }

    // ---- 5. geoSnapToSegments: fixed 5k geodesic roads, points 1x vs 10x
    val geoRoads = spark.range(5000L).select(col("id").as("sid"),
      ((pmod(xxhash64(col("id"), lit(7)), lit(1200L))).cast("double") / 10.0 - 60.0).as("alat"),
      ((pmod(xxhash64(col("id"), lit(8)), lit(3550L))).cast("double") / 10.0 - 177.5).as("alon"))
      .withColumn("blat", col("alat") + (pmod(col("sid"), lit(5L)).cast("double") - 2.0) * 0.5)
      .withColumn("blon", col("alon") + (pmod(col("sid"), lit(7L)).cast("double") - 3.0) * 0.5)
      .localCheckpoint()
    for (n <- Seq(150000L, 1500000L)) {
      val p = spark.range(n).select(col("id").as("pid"),
        ((pmod(xxhash64(col("id"), lit(9)), lit(1200L))).cast("double") / 10.0 - 60.0).as("plat"),
        ((pmod(xxhash64(col("id"), lit(10)), lit(3550L))).cast("double") / 10.0 - 177.5).as("plon"))
        .localCheckpoint()
      if (want("geosnap")) time3(s"geosnap_pts${n / 1000}k") {
        graft.core.DistanceJoin.geoSnapToSegments(p, geoRoads,
          "plat", "plon", "alat", "alon", "blat", "blon", "sid",
          startRadiusMeters = 200e3, maxRadiusMeters = 3200e3,
          maxSegMeters = 300e3, lIdCol = Some("pid")).select("pid", "sid")
      }
    }

    spark.stop()
  }
}
