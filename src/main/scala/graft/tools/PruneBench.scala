package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.engine.GeoDb
import graft.functions.GeoFunctions._

/** Measures _bbox_* row-group/file pruning with and without the Hilbert
  * clustered layout (createIndex) on a 600k-point collection. */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.parquet.blockSize", (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("prune-wh").toString
    val db = new GeoDb(spark, wh, "bench")
    db.eventLogging = false
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .repartition(32) // multi-file layout like a real ingest
      .withColumn("geometry", st_astext(st_point(col("l_extendedprice") / 32.0, col("l_quantity"))))
      .select(col("l_orderkey").as("okey"), col("geometry"))
    db.createCollection("points", Seq("okey" -> "bigint"))
    db.insertIntoCollection("points", li)

    def q() = db.getCollectionByBbox("points", (200.0, 20.0, 260.0, 24.0),
      "intersects", 4326)

    def measure(label: String, mk: () => org.apache.spark.sql.DataFrame = q _): Unit = {
      val df = mk()
      val t0 = System.nanoTime()
      val n = df.count()
      val ms = (System.nanoTime() - t0) / 1e6
      // pull scan metrics from the executed plan
      val df2 = mk(); df2.collect()
      // AQE hides finished stages behind leaf QueryStageExec nodes —
      // descend into them explicitly
      def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
        val here = p match {
          case s: FileSourceScanExec => Seq(s)
          case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(qs.plan)
          case _ => Seq.empty
        }
        here ++ p.children.flatMap(allScans)
      }
      val scans = allScans(df2.queryExecution.executedPlan)
      val out = scans.headOption.map { s =>
        val m = s.metrics
        s"scanRowsOut=${m.get("numOutputRows").map(_.value).getOrElse(-1)}"
      }.getOrElse("?")
      println(f"== $label: $n rows, $ms%.0f ms, $out")
    }

    measure("unclustered (cold)")
    measure("unclustered (warm)")
    val t0 = System.nanoTime()
    db.createIndex("points")
    println(f"== createIndex (hilbert reorganize): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    measure("hilbert-clustered (1st)")
    measure("hilbert-clustered (2nd)")

    // ---- quadkey layout (round 14): contains-mode prefix-range pruning
    // on a GEOGRAPHIC point collection, unindexed vs quadkey-clustered.
    val geo = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .repartition(32)
      .withColumn("lon", (col("l_orderkey") % 360) - 180 + col("l_quantity") / 100.0)
      .withColumn("lat", (col("l_partkey") % 120) - 60 + col("l_discount"))
      .withColumn("geometry", st_astext(st_point(col("lon"), col("lat"))))
      .select(col("l_orderkey").as("okey"), col("geometry"))
    db.createCollection("geopts", Seq("okey" -> "bigint"))
    db.insertIntoCollection("geopts", geo)
    def qg() = db.getCollectionByBbox("geopts", (10.0, 20.0, 30.0, 32.0),
      "contains", 4326)
    measure("geo unclustered contains (cold)", qg _)
    measure("geo unclustered contains (warm)", qg _)
    val t1 = System.nanoTime()
    db.createIndex("geopts", method = "quadkey", zoom = 10)
    println(f"== createIndex (quadkey z=10 reorganize): ${(System.nanoTime() - t1) / 1e9}%.1f s")
    measure("quadkey-clustered contains (1st)", qg _)
    measure("quadkey-clustered contains (2nd)", qg _)

    // ---- polygon-mask pruning (round 15): an L-shaped region whose
    // notch is ~58% of its envelope. Three plans over the SAME
    // quadkey-clustered collection: the mask query under envelope-only
    // pruning (rectangle cover of the L's bbox = what the r14 engine
    // could do), the hull cover (sound for any geometry), and the
    // tight mask cover (pointsOnly). Row counts are identical by
    // construction; scanRowsOut shows what the parquet reader had to
    // surface.
    val lMask = "POLYGON((10.25 -40.25, 90.25 -40.25, 90.25 -20.25, " +
      "30.25 -20.25, 30.25 50.25, 10.25 50.25, 10.25 -40.25))"
    def qmEnv() = db.getCollectionByBbox("geopts",
      (10.25, -40.25, 90.25, 50.25), "contains", 4326,
      where = Some("st_within(geometry, st_geomfromtext('" + lMask + "'))"))
    def qmHull() = db.getCollectionByMask("geopts", lMask)
    def qmMask() = db.getCollectionByMask("geopts", lMask, pointsOnly = true)
    measure("L-mask envelope-only cover (warm)", qmEnv _)
    measure("L-mask convex-hull cover (warm)", qmHull _)
    measure("L-mask tight mask cover, pointsOnly (warm)", qmMask _)
    spark.stop()
    println("PRUNE_DONE")
  }
}
