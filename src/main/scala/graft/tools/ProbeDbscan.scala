package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Split q226's cost: eps-graph join vs components vs label joins. */
object ProbeDbscan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      val lat = ((col("c_custkey") % 77) % 7).cast("double") * 12 - 36 +
        (col("c_custkey") % 29).cast("double") * 0.004
      val lon = expr("(c_custkey % 77) div 7").cast("double") * 24 - 120
      val pts = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), lat.as("lat"), lon.as("lon"))
      val slim = pts.select(col("c_custkey").as("_pid"),
        col("lat").as("_plat"), col("lon").as("_plon"))
      val other = slim.select(col("_pid").as("_qid"),
        col("_plat").as("_qlat"), col("_plon").as("_qlon"))
      val pairs = t("eps_graph") {
        graft.core.DistanceJoin.geoRadiusJoin(slim, other,
            "_plat", "_plon", "_qlat", "_qlon", 2000.0)
          .select(col("_pid"), col("_qid")).localCheckpoint()
      }
      println(s"  pairs: ${pairs.count()}")
      val cores = t("cores") {
        pairs.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
          .filter(col("_n") >= 4).select(col("_pid")).localCheckpoint()
      }
      val coreEdges = pairs.filter(col("_pid") < col("_qid"))
        .join(cores, Seq("_pid"), "left_semi")
        .join(cores.select(col("_pid").as("_qid")), Seq("_qid"), "left_semi")
        .select(col("_pid").as("id"), col("_qid").as("id2"))
      val comps = t("components") {
        val c = graft.ext.Dedup.components(coreEdges, 20)
        c.count(); c
      }
      t("full_gate") {
        val df = graft.SparkEntry.queries("q226_geo_dbscan")(spark, dir)
        df.select(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).head()
      }
    }
    spark.stop()
  }
}
