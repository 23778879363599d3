package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 derived-scale probes (the ScaleProbeX recipe): the 10×
  * rotated documents corpus for the tokenizer/LM/sampling family, and
  * synthetic point/interval frames whose DENSITY stays constant as
  * rows scale (domain grows with n for intervals, with sqrt(n) for the
  * plane), so per-row work — the thing that must stay flat — is what
  * the 1× → 10× ratio measures. Measurement only: gates never read
  * these files. */
object ScaleProbe12 {
  private val root = "/tmp/graft_scale12"

  private def time3(label: String)(df: => DataFrame): Unit = {
    System.gc()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val d = df
      val r = d.select(count(lit(1)).as("n"),
        bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0))
    }
    println(f"SCALE12 $label min=${times.map(_._1).min}%.3f rows=${times.head._2}")
  }

  def main(args: Array[String]): Unit = {
    val only = args.toSet
    def want(label: String): Boolean =
      only.isEmpty || only.exists(label.contains)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)

    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs10Path = s"$root/documents10.parquet"
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    (0 until 10).map { i =>
      val rot = alpha.drop(i * 7 % 26) + alpha.take(i * 7 % 26)
      docs1.select((col("doc_id") + i * 1000000L).as("doc_id"),
        translate(col("text"), alpha, rot).as("text"))
    }.reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(docs10Path)
    val docs10 = spark.read.parquet(docs10Path)
    println(s"corpus sizes: 1x=${docs1.count()} 10x=${docs10.count()}")

    import graft.ext.{NgramLm, RangeJoin, TextAnalysis, WordPiece}
    import graft.core.DistanceJoin

    // constant-density synthetic planes / interval axes
    def points(n: Long, side: Double, seed: Int): DataFrame =
      spark.range(n).select(col("id"),
        (pmod(xxhash64(col("id") + seed), lit(1000000)).cast("double")
          / 1e6 * side).as("x"),
        (pmod(xxhash64(col("id") + seed + 7), lit(1000000)).cast("double")
          / 1e6 * side).as("y"))
    def intervals(n: Long, domain: Double, seed: Int): DataFrame =
      spark.range(n).select(col("id"),
        (pmod(xxhash64(col("id") + seed), lit(1000000)).cast("double")
          / 1e6 * domain).as("lo"))
        .withColumn("hi", col("lo") +
          (pmod(xxhash64(col("id") - seed), lit(20)) + 1).cast("double"))

    for ((label, docs, scale) <- Seq(("1x", docs1, 1.0), ("10x", docs10, 10.0))) {
      if (want("wordpieceTrain")) time3(s"$label wordpieceTrain")(
        WordPiece.trainMerges(docs, "text", rounds = 8))
      if (want("wordpieceEncode")) time3(s"$label wordpieceEncode")(
        WordPiece.segmentCounts(docs, "text", "doc_id", rounds = 8))
      if (want("backoffLm")) time3(s"$label backoffLm")(
        NgramLm.stupidBackoffScores(docs, "text", "doc_id",
          docs.filter(col("doc_id") % 10 < 3), "text"))
      if (want("weightedSample")) time3(s"$label weightedSample")(
        TextAnalysis.weightedSample(
          docs.withColumn("wt",
            (coalesce(length(col("text")), lit(0)) + 1).cast("double")),
          "wt", "doc_id", k = 100))
      val side = 1000.0 * math.sqrt(scale)
      val n = (15000 * scale).toLong
      val l = points(n, side, 1).toDF("lid", "lx", "ly")
      val r = points(n / 10, side, 99).toDF("rid", "rx", "ry")
      if (want("radiusJoin")) time3(s"$label radiusJoin")(
        DistanceJoin.radiusJoin(l, r, "lx", "ly", "rx", "ry", radius = 25.0))
      if (want("nearestJoin")) time3(s"$label nearestJoin")(
        DistanceJoin.nearestJoin(l, r, "lx", "ly", "rx", "ry", "rid",
          startRadius = 25.0, maxRadius = 4096.0))
      val ia = intervals(n, 500.0 * scale, 3).toDF("aid", "alo", "ahi")
      val ib = intervals(n, 500.0 * scale, 17)
        .toDF("bid", "blo", "bhi")
      if (want("overlapJoin")) time3(s"$label overlapJoin")(
        RangeJoin.intervalOverlapJoin(ia, "alo", "ahi", ib, "blo", "bhi",
          binWidth = 16.0))
    }
    spark.stop()
  }
}
