package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.TextFunctions._

/** Stage-by-stage timing of the q30 prefix-filter jaccard join. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val threshold = 0.3

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"== round $round")
      val grams = df.select(col("doc_id").as("id"),
          word_shingles(col("text"), lit(3)).as("grams"))
        .filter(size(col("grams")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("grams")(grams.count())
      val dfreq = grams.select(explode(col("grams")).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("_df"))
      time("dfreq")(dfreq.count())
      val exploded = grams
        .select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("gram"))
        .join(dfreq, Seq("gram"))
      val w = Window.partitionBy("id").orderBy(col("_df"), col("gram"))
      val prefix = exploded
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= floor((lit(1.0) - lit(threshold)) * col("sz")) + lit(1))
        .select("gram", "id", "sz")
      time("prefix(window)")(prefix.count())
      val candidates = prefix
        .join(prefix.select(col("gram"), col("id").as("id2"), col("sz").as("sz2")),
          Seq("gram"))
        .filter(col("id") < col("id2"))
        .filter(col("sz") * lit(threshold) <= col("sz2") &&
                col("sz2") * lit(threshold) <= col("sz"))
        .select("id", "id2")
        .distinct()
      val nc = time("candidates")(candidates.count())
      println(s"  n_candidates = $nc")
      val verified = candidates
        .join(grams, Seq("id"))
        .join(grams.select(col("id").as("id2"), col("grams").as("grams2")), Seq("id2"))
        .withColumn("jaccard",
          size(array_intersect(col("grams"), col("grams2"))).cast("double") /
          size(array_union(col("grams"), col("grams2"))))
        .filter(col("jaccard") >= threshold)
      println(s"  n_pairs = ${time("verify")(verified.count())}")

      // variant: hash-order prefix (arrays pre-sorted), no dfreq/window
      val prefix2 = grams.select(col("id"), size(col("grams")).as("sz"),
        explode(slice(col("grams"), lit(1),
          (floor((lit(1.0) - lit(threshold)) * size(col("grams"))) + lit(1)).cast("int"))).as("gram"))
      time("prefix2(slice)")(prefix2.count())
      val cand2 = prefix2
        .join(prefix2.select(col("gram"), col("id").as("id2"), col("sz").as("sz2")),
          Seq("gram"))
        .filter(col("id") < col("id2"))
        .filter(col("sz") * lit(threshold) <= col("sz2") &&
                col("sz2") * lit(threshold) <= col("sz"))
        .select("id", "id2")
        .distinct()
      val nc2 = time("candidates2")(cand2.count())
      println(s"  n_candidates2 = $nc2")
      val verified2 = cand2
        .join(grams, Seq("id"))
        .join(grams.select(col("id").as("id2"), col("grams").as("grams2")), Seq("id2"))
        .withColumn("jaccard",
          size(array_intersect(col("grams"), col("grams2"))).cast("double") /
          size(array_union(col("grams"), col("grams2"))))
        .filter(col("jaccard") >= threshold)
      println(s"  n_pairs2 = ${time("verify2")(verified2.count())}")
      grams.unpersist()
    }
    spark.stop()
  }
}
