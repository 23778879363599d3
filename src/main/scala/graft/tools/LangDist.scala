package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextFunctions._

object LangDist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    for (sf <- Seq("0.01", "0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val d = docs.select(lang_id(col("text")).as("p")).groupBy("p").count()
        .orderBy("p").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
      println(s"sf$sf pred-dist: $d")
      val fp = docs.agg(countDistinct(col("text")).as("nt"),
        countDistinct(fingerprint64(col("text"))).as("nf")).head()
      println(s"sf$sf texts=${fp.get(0)} fps=${fp.get(1)}")
    }
    spark.stop()
  }
}
