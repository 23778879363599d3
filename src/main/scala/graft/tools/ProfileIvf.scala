package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      println(s"== round $round")
      val model = time("train")(graft.ext.Ivf.train(emb, "embedding", k = 8, maxIter = 5))
      val assigned = graft.ext.Ivf.assign(emb, "embedding", model)
      val res = time("search")(
        graft.ext.Ivf.search(assigned, emb.filter(col("vec_id") < 5), model,
          "embedding", "vec_id", k = 10, nprobe = 3).count())
      println(s"  rows = $res")
    }
    spark.stop()
  }
}
