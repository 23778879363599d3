package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-like sequential profile: runs the given queries in ONE JVM in
  * order, min of 3 timed runs each — shows shared-cache interplay the
  * single-query ProfileQ can't. */
object ProfileSeq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q28_dedup_minhash", "q29_dedup_simhash", "q70_dedup_cluster_keepers")
    // warmup at sf0.001 like the bench
    qs.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    qs.foreach { q =>
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q: min ${times.min}%.2f s (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
