package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 scale probes for the new surface. Measurement only.
  *
  *  1. GridSpatialJoin DISTANCE rewrite: points 1x vs 10x against a
  *     fixed polygon layer — wall must track the points side (cell
  *     hash join), and the rewrite must beat the BNLJ baseline by a
  *     widening margin.
  *  2. geoSpaceTimeJoinStream (batch mode): events 1x vs 10x at fixed
  *     radius/tau — the banded-cell + time-bucket join must track the
  *     input, not pairs².
  *  3. quadkey layout maintenance: insert throughput with vs without
  *     a declared _qk column (the DML premium of the maintained
  *     layout).
  */
object ScaleProbe17 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.registerAll(spark)
    import graft.functions.GeoFunctions._
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(graft.plans.GridSpatialJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.GridSpatialJoin

    def time3(label: String)(df: => DataFrame): Unit = {
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val d = df
        val r = d.select(count(lit(1)).as("n"),
          bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      println(f"SCALE17 $label%-44s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    // ---- 1. distance rewrite scaling: 2k polygons x 100k/1M points
    val polys = (0 until 2000).map { i =>
      val x = (i * 13) % 4000; val y = (i * 29) % 4000
      (i.toLong, s"POLYGON(($x $y, ${x + 6} $y, $x ${y + 6}, $x $y))")
    }.toDF("gid", "wkt").select($"gid", st_geomfromtext($"wkt").as("geom"))
      .localCheckpoint(true)
    def pts(n: Int) = (0 until n).map(i =>
      (i.toLong, ((i * 7) % 4000).toDouble, ((i * 23) % 4000).toDouble))
      .toDF("pid", "px", "py").repartition(32).localCheckpoint(true)
    val p1 = pts(100000); val p10 = pts(1000000)
    spark.conf.set("spark.graft.spatialJoin.cellSize", "10.0")
    def distJoin(p: DataFrame) = {
      val q = polys.join(p,
          st_distance($"geom", st_point($"px", $"py")) <= 10.0)
        .select("gid", "pid")
      require(q.queryExecution.optimizedPlan.toString.contains("_graft_dacx"),
        "rewrite did not fire")
      q
    }
    time3("distance-rewrite 100k pts")(distJoin(p1))
    time3("distance-rewrite 1M pts")(distJoin(p10))
    spark.conf.unset("spark.graft.spatialJoin.cellSize")
    // BNLJ baseline at the SMALL scale only (the point of the rule)
    time3("distance BNLJ baseline 100k pts") {
      polys.join(p1, st_distance($"geom", st_point($"px", $"py")) <= 10.0)
        .select("gid", "pid")
    }

    // ---- 2. geo stream-stream co-location (batch mode) 1x vs 10x
    def geoEv(n: Int, salt: Int) = (0 until n).map { i =>
      val id = i.toLong * 2 + salt
      (id, ((id * 29) % 1200).toDouble / 10.0 - 60.0,
        ((id * 43) % 3600).toDouble / 10.0 - 180.0,
        ((id * 7) % 3000).toDouble + 86400.0)
    }.toDF("id", "lat", "lon", "t").repartition(32).localCheckpoint(true)
    for (n <- Seq(30000, 300000)) {
      val a = geoEv(n, 0).toDF("a_id", "alat", "alon", "at")
      val b = geoEv(n, 1).toDF("b_id", "blat", "blon", "bt")
      time3(s"geoSpaceTimeJoin ${n}x${n}") {
        graft.core.DistanceJoin.geoSpaceTimeJoinStream(a, b,
          "alat", "alon", "at", "blat", "blon", "bt",
          radiusMeters = 200000.0, tau = 60.0, watermarkDelay = "1 hour")
          .select("a_id", "b_id")
      }
      a.unpersist(); b.unpersist()
    }
    p1.unpersist(); p10.unpersist(); polys.unpersist()
    println("SCALE17_DONE")
    spark.stop()
  }
}
