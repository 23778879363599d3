package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePca {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.count()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"PROBE $tag ${(System.nanoTime()-t0)/1e9}"); r
    }
    t("momentSums_cold") { graft.ext.Pca.momentSums(emb, "embedding", 64).collect().length }
    t("momentSums_warm") { graft.ext.Pca.momentSums(emb, "embedding", 64).collect().length }
    t("fit_warm") { graft.ext.Pca.fit(emb, "embedding", 64) }
    t("fit2") { graft.ext.Pca.fit(emb, "embedding", 64) }
    spark.stop()
  }
}
