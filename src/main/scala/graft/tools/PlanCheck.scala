package graft.tools
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_filter_page","q16_agg_group","q17_join_broadcast","q28_dedup_minhash")
    for (q <- qs) {
      println(s"######## $q")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
