package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileEd {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    val base = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    def t[A](l: String)(f: => A): Unit = { val t0=System.nanoTime(); f; println(f"$l: ${(System.nanoTime()-t0)/1e9}%.2f s") }
    // warm
    graft.ext.Dedup.editDistancePairs(base.limit(500), "s", "id", 1, 3).count()
    (1 to 3).foreach { i =>
      t(s"run$i full op")(
        println("pairs: " + graft.ext.Dedup.editDistancePairs(base, "s", "id", 1, 3).count()))
    }
    spark.stop()
  }
}
