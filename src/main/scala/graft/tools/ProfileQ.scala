package graft.tools

import org.apache.spark.sql.SparkSession

object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val q = args.headOption.getOrElse("q30_ngram_jaccard")
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"$q run$i: ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
