package graft.tools

import org.apache.spark.sql.SparkSession

/** Min-of-3 timings for a query subset at two SFs in one JVM — the
  * SCALE.md measurement harness (same config as Bench). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q28_dedup_minhash", "q99_image_pixel_dedup",
        "q100_boilerplate_lines", "q101_audio_pcm_dedup",
        "q102_image_neardup", "q103_audio_neardup")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup at the smallest SF (JIT + codegen), mirroring Bench
    qs.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    for (sf <- Seq("sf0.01", "sf0.1"); q <- qs) {
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try graft.SparkEntry.queries(q)(spark, s"/root/testdata/$sf").count()
        catch { case e: Throwable => println(s"$q@$sf FAILED: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCALEPROBE $sf $q min=${times.min}%.3f spread=${times.max - times.min}%.3f")
    }
    spark.stop()
  }
}
