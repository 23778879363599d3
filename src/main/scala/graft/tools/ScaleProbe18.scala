package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14b scale probes for the spherical wave. Measurement only.
  *
  *  1. GEODESIC distance rewrite (chord-space cells): lat/lon points
  *     1x vs 10x joined within 50 km — wall must track the input (the
  *     build side's fan-out is a CONSTANT ≤ 27), and the rewrite must
  *     beat the BNLJ baseline by a widening margin. The manual
  *     `geoRadiusJoin` (latitude-banded cells) runs beside it: the
  *     two fast paths should be the same complexity class.
  *  2. EnvelopePrefilter RADIUS pruning: parquet scan rows with vs
  *     without the distance conjunct injection on a 600k-point
  *     collection (the PruneBench story for st_dwithin).
  *  3. kinematics: 1x vs 10x points — one lag window, wall must track
  *     input; kinematicsStream in batch mode beside it (the stateful
  *     scan pays the groupByKey shuffle + typed encoding).
  */
object ScaleProbe18 {

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
      println(f"SCALE18 $label%-44s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    // ---- 1. geodesic rewrite scaling: 20k sites x 100k/1M probes,
    // 50 km. Sites cluster on a 1° lattice so matches exist everywhere.
    def sites(n: Int) = (0 until n).map { i =>
      (i.toLong, (i * 7 % 360).toDouble - 179.5 + (i % 13) * 0.003,
        (i * 11 % 170).toDouble - 84.5 + (i % 17) * 0.002)
    }.toDF("sid", "slon", "slat").localCheckpoint(true)
    def probes(n: Int) = (0 until n).map { i =>
      (100000L + i, (i * 3 % 360).toDouble - 179.5 + (i % 19) * 0.004,
        (i * 13 % 170).toDouble - 84.5 + (i % 23) * 0.003)
    }.toDF("pid", "plon", "plat").localCheckpoint(true)
    val s20k = sites(20000)
    val p100k = probes(100000)
    val p1m = probes(1000000)
    val r = 50000.0
    def geoJoin(p: DataFrame) = {
      spark.conf.set("spark.graft.spatialJoin.geodesic", "true")
      try {
        val q = p.join(s20k,
          st_distance_spherical(st_point(col("plon"), col("plat")),
            st_point(col("slon"), col("slat"))) <= r)
          .select("pid", "sid")
        require(q.queryExecution.optimizedPlan.toString.contains("_graft_gsca0"))
        q.localCheckpoint()
      } finally spark.conf.unset("spark.graft.spatialJoin.geodesic")
    }
    time3("geo rewrite 100k x 20k r=50km")(geoJoin(p100k))
    time3("geo rewrite 1M x 20k r=50km")(geoJoin(p1m))
    time3("manual geoRadiusJoin 1M x 20k r=50km")(
      graft.core.DistanceJoin.geoRadiusJoin(
        p1m, s20k, "plat", "plon", "slat", "slon", r).select("pid", "sid"))
    // BNLJ baseline on a 1/100 sample of the probes (the full cross
    // product is 2e10 pairs — hours; scale the measured wall by 100)
    val pSmall = probes(10000)
    time3("BNLJ baseline 10k x 20k (x100 to compare)")(
      pSmall.join(s20k,
        st_distance_spherical(st_point(col("plon"), col("plat")),
          st_point(col("slon"), col("slat"))) <= r).select("pid", "sid"))

    // ---- 2. radius-scan pruning on a 600k-point collection
    val wh = java.nio.file.Files.createTempDirectory("sp18-wh").toString
    val db = new graft.engine.GeoDb(spark, wh, "probe")
    db.eventLogging = false
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.parquet.blockSize", (1 << 20).toString)
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .repartition(32)
      .withColumn("geometry", st_astext(st_point(
        col("l_extendedprice") / 32.0, col("l_quantity"))))
      .select(col("l_orderkey").as("okey"), col("geometry"))
    db.createCollection("pts", Seq("okey" -> "bigint"))
    db.insertIntoCollection("pts", li)
    db.createIndex("pts", "geometry") // Hilbert layout so pruning can bite
    def scanRows(q: DataFrame): Long = {
      q.collect()
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
        val here = p match {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allScans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allScans(qs.plan)
          case _ => Seq.empty
        }
        here ++ p.children.flatMap(allScans)
      }
      allScans(q.queryExecution.executedPlan)
        .headOption.flatMap(_.metrics.get("numOutputRows").map(_.value)).getOrElse(-1)
    }
    val radiusQ = db.getCollection("pts").filter(
      st_dwithin(col("geometry"), st_point(lit(230.0), lit(22.0)), lit(8.0)))
    val n1 = scanRows(radiusQ)
    // same rows through an injection-proof spelling (radius via a
    // non-foldable column) = the unpruned baseline
    val noPrune = db.getCollection("pts")
      .withColumn("_r", lit(8.0) + (col("okey") - col("okey")).cast("double"))
      .filter(st_distance(col("geometry"),
        st_point(lit(230.0), lit(22.0))) <= col("_r"))
    val n0 = scanRows(noPrune)
    println(s"SCALE18 radius-prune scanRows pruned=$n1 unpruned=$n0 " +
      f"(${n0.toDouble / math.max(1, n1)}%.1fx)")

    // ---- 3. kinematics scaling: 100k vs 1M points, 1k keys
    def track(n: Int) = (0 until n).map { i =>
      ((i % 1000).toLong, (i / 1000).toLong,
        ((i * 3) % 320) * 0.01 - 1.6, ((i * 7) % 280) * 0.01 - 1.4)
    }.toDF("k", "t", "lon", "lat").localCheckpoint(true)
    val t100k = track(100000)
    val t1m = track(1000000)
    time3("kinematics window 100k")(
      graft.core.Trajectory.kinematics(t100k, "k", "t", "lon", "lat"))
    time3("kinematics window 1M")(
      graft.core.Trajectory.kinematics(t1m, "k", "t", "lon", "lat"))
    time3("kinematicsStream batch-mode 1M")(
      graft.core.Trajectory.kinematicsStream(t1m, "k", "t", "lon", "lat"))

    spark.stop()
  }
}
