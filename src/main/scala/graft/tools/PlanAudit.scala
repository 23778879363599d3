package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q96_bm25_topk", "q98_length_percentiles_approx", "q100_boilerplate_lines")) {
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("TakeOrdered") ||
          l.contains("Aggregate") || l.contains("Sort") || l.contains("Join") ||
          l.contains("WholeStageCodegen")).mkString("\n"))
    }
    spark.stop()
  }
}
