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

    def measure(label: String): Unit = {
      val df = q()
      val t0 = System.nanoTime()
      val n = df.count()
      val ms = (System.nanoTime() - t0) / 1e6
      // pull scan metrics from the executed plan
      val df2 = q(); df2.collect()
      val scans = df2.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case s: FileSourceScanExec => s }
        case s: FileSourceScanExec => Seq(s)
      }.flatten
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
    spark.stop()
    println("PRUNE_DONE")
  }
}
