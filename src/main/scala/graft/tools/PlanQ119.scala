package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanQ119 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .withColumn("score", (col("doc_id") * 37 % 101).cast("double"))
    val out = graft.ext.TextAnalysis.tokenBudgetSelect(docs, "text", "doc_id", "source", "score", 1000L)
    val plan = out.queryExecution.executedPlan.toString
    println("== singlePartition exchanges: " + "Exchange SinglePartition".r.findAllIn(plan).length)
    println("== broadcast joins: " + "BroadcastHashJoin".r.findAllIn(plan).length)
    println("== range exchanges: " + "rangepartitioning".r.findAllIn(plan.toLowerCase).length)
    println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Window")).mkString("\n"))
    spark.stop()
  }
}
