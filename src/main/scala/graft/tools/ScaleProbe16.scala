package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 probe: per-round cost of RELIABLE checkpoints vs the
  * localCheckpoint default on the iterative operators
  * ([[graft.core.Checkpoints]], `spark.graft.checkpointDir`).
  * Measurement only — row-identity across the modes is pinned by
  * ExtSpec; this quantifies the insurance premium a cluster run pays
  * for surviving executor loss: one FS write + read of the slim
  * per-round frame (16-byte rows for pageRank/components).
  */
object ScaleProbe16 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time3(label: String)(df: => DataFrame): Unit = {
      System.gc()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val d = df
        val r = d.select(count(lit(1)).as("n"),
          bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0))
      }
      println(f"SCALE16 $label%-44s min=${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }

    def edges(n: Int, m: Int): DataFrame = {
      val rnd = new scala.util.Random(7)
      (0 until m).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .toDF("src", "dst").repartition(32)
    }

    for ((n, m, tag) <- Seq((20000, 200000, "200k-edges"),
                            (200000, 2000000, "2M-edges"))) {
      val e = e0(spark, edges(n, m))
      spark.conf.unset(graft.core.Checkpoints.ConfKey)
      time3(s"pageRank(10) local-ckpt $tag") {
        graft.ext.Graph.pageRank(e, iters = 10) }
      time3(s"components local-ckpt $tag") {
        graft.ext.Dedup.components(
          e.filter($"src" =!= $"dst").select($"src".as("id"), $"dst".as("id2"))) }
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt16").toString
      spark.conf.set(graft.core.Checkpoints.ConfKey, dir)
      time3(s"pageRank(10) reliable-ckpt $tag") {
        graft.ext.Graph.pageRank(e, iters = 10) }
      time3(s"components reliable-ckpt $tag") {
        graft.ext.Dedup.components(
          e.filter($"src" =!= $"dst").select($"src".as("id"), $"dst".as("id2"))) }
      spark.conf.unset(graft.core.Checkpoints.ConfKey)
      e.unpersist()
    }
    println("SCALE16_DONE")
    spark.stop()
  }

  private def e0(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count(); p
  }
}
