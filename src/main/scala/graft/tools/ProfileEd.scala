package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.TextFunctions._

/** Stage-by-stage cost attribution for `Dedup.editDistancePairs` on
  * the q135 corpus (sf0.1 customer names) — replicates the operator's
  * exact pipeline piecewise so each phase's cost and cardinality are
  * visible (the operator itself fuses them). Measurement only. */
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
      .persist()
    base.count()
    def t(l: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $l: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val maxDist = 1; val q = 3
    val pb = maxDist * q + 1
    // phase 1: shingle + df agg + rarest-prefix window (the operator
    // checkpoints this frame)
    val sets = base.filter(length(col("s")) > maxDist * q + q - 1)
      .select(col("id"), length(col("s")).as("len"),
        char_shingles(col("s"), lit(q)).as("grams"))
    val exploded = sets.select(col("id"), col("len"),
      explode(col("grams")).as("gram"))
    val dfreq = exploded.groupBy("gram").agg(count(lit(1)).as("_df"))
    val w = Window.partitionBy("id").orderBy(col("_df"), col("gram"))
    def prefix() = exploded.join(dfreq, Seq("gram"))
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= pb)
      .select("gram", "id", "len")
    t("prefix (shingle+dfagg+window)")(prefix().count())
    val pruned = prefix().localCheckpoint()
    // phase 2: bucket self-join -> raw candidate stream
    def raw() = pruned.join(pruned.select(col("gram"), col("id").as("id2"),
        col("len").as("len2")), Seq("gram"))
      .filter(col("id") < col("id2"))
      .filter(abs(col("len") - col("len2")) <= maxDist)
    t("raw candidates (bucket join)")(raw().count())
    // phase 3: distinct slim pairs
    def dist() = raw().select("id", "id2").distinct()
    t("distinct candidates")(dist().count())
    val cand = dist().localCheckpoint()
    // phase 4: string rejoin x2 + levenshtein verify
    t("verify (2 rejoins + levenshtein)")(
      cand.join(base, Seq("id"))
        .join(base.select(col("id").as("id2"), col("s").as("s2")), Seq("id2"))
        .withColumn("dist", levenshtein(col("s"), col("s2")))
        .filter(col("dist") <= maxDist).count())
    // phase 4b: levenshtein only (strings carried, no rejoin) for
    // attribution of join vs kernel
    val candS = cand.join(base, Seq("id"))
      .join(base.select(col("id").as("id2"), col("s").as("s2")), Seq("id2"))
      .localCheckpoint()
    t("levenshtein only (pre-joined)")(
      candS.withColumn("dist", levenshtein(col("s"), col("s2")))
        .filter(col("dist") <= maxDist).count())
    // variant B: NO candidate distinct — rejoin strings and verify on
    // the raw (repeat-bearing) stream, distinct only the small result
    t("variant B: verify-on-raw, distinct last")(
      raw().select("id", "id2")
        .join(base, Seq("id"))
        .join(base.select(col("id").as("id2"), col("s").as("s2")), Seq("id2"))
        .withColumn("dist", levenshtein(col("s"), col("s2")))
        .filter(col("dist") <= maxDist)
        .select("id", "id2", "dist").distinct().count())
    // variant C: carry strings through the bucket join (no rejoins)
    val prunedS = prefix().join(base, Seq("id")).localCheckpoint()
    t("variant C: strings carried, verify, distinct last")(
      prunedS.join(prunedS.select(col("gram"), col("id").as("id2"),
          col("len").as("len2"), col("s").as("s2")), Seq("gram"))
        .filter(col("id") < col("id2"))
        .filter(abs(col("len") - col("len2")) <= maxDist)
        .withColumn("dist", levenshtein(col("s"), col("s2")))
        .filter(col("dist") <= maxDist)
        .select("id", "id2", "dist").distinct().count())
    // variant D: raw -> cheap repartition exchange (no hash-agg build)
    // -> rejoin+verify -> distinct last
    t("variant D: repartition, verify, distinct last")(
      raw().select("id", "id2").repartition(32)
        .join(base, Seq("id"))
        .join(base.select(col("id").as("id2"), col("s").as("s2")), Seq("id2"))
        .withColumn("dist", levenshtein(col("s"), col("s2")))
        .filter(col("dist") <= maxDist)
        .select("id", "id2", "dist").distinct().count())
    // variant E: distinct with 4x partitions (is it agg-build bound?)
    t("variant E: distinct at 128 partitions")(
      raw().select("id", "id2").repartition(128, col("id"), col("id2"))
        .dropDuplicates("id", "id2").count())
    // the operator end to end, for the total
    t("editDistancePairs total")(
      graft.ext.Dedup.editDistancePairs(base, "s", "id", 1, 3).count())
    spark.stop()
  }
}
