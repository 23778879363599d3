package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: pin percentile_approx's exact-regime rank convention so the
  * q98 oracle can reproduce sketch values independently in SQL. */
object ProfileApproxPct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // small synthetic sets with known order statistics, incl. heavy ties
    val sets: Seq[(String, Seq[Double])] = Seq(
      "n4" -> Seq(1, 2, 3, 4).map(_.toDouble),
      "n5" -> Seq(10, 20, 30, 40, 50).map(_.toDouble),
      "n10" -> (1 to 10).map(_.toDouble),
      "ties" -> Seq(1, 1, 1, 2, 2, 3, 3, 3, 3, 9).map(_.toDouble),
      "n7" -> Seq(5, 1, 9, 3, 7, 2, 8).map(_.toDouble))
    for ((name, vs) <- sets; p <- Seq(0.5, 0.9)) {
      val df = vs.toDF("n")
      val v = df.agg(percentile_approx(col("n"), lit(p), lit(1000000)))
        .first().getDouble(0)
      val sorted = vs.sorted
      val asRank = sorted.indexOf(v) + 1
      println(s"$name p=$p n=${vs.length} -> $v (first 1-based rank of value: $asRank, " +
        s"ceil(p*n)=${math.ceil(p * vs.length).toInt}, floor(p*(n-1))+1=${math.floor(p * (vs.length - 1)).toInt + 1})")
    }

    // the real gate data at all three SFs
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      graft.ext.TextFunctions.registerAll(spark)
      val t = d.select(col("source"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(graft.ext.TextFunctions.token_count(col("text")))
          .cast("double").as("n"))
      val r = t.groupBy("source").agg(
        count(lit(1)).as("cnt"),
        percentile_approx(col("n"), lit(0.5), lit(1000000)).as("p50"),
        percentile_approx(col("n"), lit(0.9), lit(1000000)).as("p90"))
        .orderBy("source")
      println(s"== $sf ==")
      r.collect().foreach(println)
    }
    spark.stop()
  }
}
