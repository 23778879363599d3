package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the round-13 graph family: prints the per-iteration
  * pageRank join plan (the claim under audit: the persisted
  * repartition(src) edge frame is NOT re-exchanged every round — only
  * the slim rank frame moves) and the triangle wedge-join plan. */
object PlanGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.range(200000).select(
        pmod(xxhash64(col("id"), lit(1)), lit(20000L)).as("src"),
        pmod(xxhash64(col("id"), lit(2)), lit(20000L)).as("dst"))
      .repartition(col("src"))
      .persist()
    e.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    deg.count()
    val eDeg = e.join(deg, Seq("src")).persist()
    eDeg.count()
    val ranks = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000L).as("pr")).localCheckpoint()
    val contrib = eDeg
      .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("dst").as("node"),
        expr("(pr * 85) div (100 * outdeg)").as("c"))
      .groupBy("node").agg(sum("c").as("cs"))
    println("== pageRank per-iteration contrib plan ==")
    println(contrib.queryExecution.executedPlan.toString.take(4000))
    val exchanges = contrib.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange")).toSeq
    println(s"EXCHANGES=${exchanges.size}")
    exchanges.foreach(x => println("  " + x.trim.take(110)))
    spark.stop()
  }
}
