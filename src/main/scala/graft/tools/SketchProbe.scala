package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe of Spark 4.1's DataSketches function signatures
  * (kll / theta / bloom / approx_top_k) before wiring them into
  * ext/Sketches. */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (f <- Seq("kll_sketch_agg_double", "kll_merge_agg_double",
        "kll_sketch_get_quantile_double", "kll_sketch_get_rank_double",
        "kll_sketch_get_n_double", "theta_sketch_agg", "theta_union_agg",
        "theta_intersection_agg", "theta_intersection", "theta_difference",
        "theta_sketch_estimate", "bloom_filter_agg", "approx_top_k_accumulate",
        "approx_top_k_combine", "approx_top_k_estimate")) {
      println(s"== $f")
      try spark.sql(s"DESCRIBE FUNCTION EXTENDED $f").collect()
        .foreach(r => println("   " + r.getString(0).linesIterator.take(12).mkString("\n   ")))
      catch { case e: Exception => println("   ERR " + e.getMessage.take(200)) }
    }
    // live probes
    spark.sql("CREATE TEMP VIEW v AS SELECT CAST(id AS DOUBLE) d, id i, CAST(id % 3 AS STRING) s FROM range(1000)")
    def go(q: String): Unit =
      try println(q + "  ->  " + spark.sql(q).collect().mkString(" | ").take(300))
      catch { case e: Exception => println(q + "  ERR  " + e.getMessage.take(300)) }
    go("SELECT kll_sketch_get_quantile_double(kll_sketch_agg_double(d), 0.5) FROM v")
    go("SELECT kll_sketch_get_quantile_double(kll_sketch_agg_double(d, 200), array(0.25D, 0.5D, 0.75D)) FROM v")
    go("SELECT kll_sketch_get_rank_double(kll_sketch_agg_double(d), 500.0D) FROM v")
    go("SELECT kll_sketch_get_n_double(kll_merge_agg_double(sk)) FROM (SELECT s, kll_sketch_agg_double(d) sk FROM v GROUP BY s)")
    go("SELECT theta_sketch_estimate(theta_sketch_agg(s)) FROM v")
    go("SELECT theta_sketch_estimate(theta_union_agg(sk)) FROM (SELECT s, theta_sketch_agg(s) sk FROM v GROUP BY s)")
    go("SELECT theta_sketch_estimate(theta_intersection(a.sk, b.sk)) FROM (SELECT theta_sketch_agg(s) sk FROM v WHERE i < 600) a, (SELECT theta_sketch_agg(s) sk FROM v WHERE i >= 300) b")
    go("SELECT theta_sketch_estimate(theta_sketch_agg(i)) FROM v")
    go("SELECT approx_top_k_estimate(approx_top_k_accumulate(s), 2) FROM v")
    // bloom agg + might_contain via internal expressions through the bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftx.Bridge
    val aggC = Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(col("s"))),
      Literal(1000L), Literal(8000L)).toAggregateExpression())
    val bloomBytes = spark.table("v").agg(aggC).head().getAs[Array[Byte]](0)
    println("bloom bytes: " + bloomBytes.length)
    val mc = spark.table("v").select(col("s"),
      Bridge.column(BloomFilterMightContain(Literal(bloomBytes),
        Bridge.expression(xxhash64(col("s"))))).as("hit"))
      .groupBy(col("hit")).count().collect().mkString(" | ")
    println("might_contain on members: " + mc)
    val miss = spark.range(5000).select(
      Bridge.column(BloomFilterMightContain(Literal(bloomBytes),
        Bridge.expression(xxhash64(concat(lit("zz"), col("id").cast("string"))))))
        .as("hit")).filter(col("hit")).count()
    println("might_contain false positives over 5000 non-members: " + miss)
    // util-level OR-merge of two compatible blooms
    val b2 = spark.range(10).select(concat(lit("m"), col("id").cast("string")).as("s"))
      .agg(Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(col("s"))),
        Literal(1000L), Literal(8000L)).toAggregateExpression()))
      .head().getAs[Array[Byte]](0)
    val f1 = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
    val f2 = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(b2))
    f1.mergeInPlace(f2)
    val bos = new java.io.ByteArrayOutputStream(); f1.writeTo(bos)
    val mergedBytes = bos.toByteArray
    val hits = spark.range(10).select(
      Bridge.column(BloomFilterMightContain(Literal(mergedBytes),
        Bridge.expression(xxhash64(concat(lit("m"), col("id").cast("string"))))))
        .as("hit")).filter(col("hit")).count()
    println("merged bloom hits on second set (want 10): " + hits)
    println("PROBE_DONE")
  }
}
