package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup

object ProfileQ29 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"== round $round")
      val exact = Dedup.charJaccardPairs(docs, "text", "doc_id", k = 5, threshold = 0.8)
      println(s"  n_exact = ${time("charJaccard0.8")(exact.count())}")
      val sim = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 8)
      println(s"  n_simhash = ${time("simhash")(sim.count())}")
    }
    spark.stop()
  }
}
