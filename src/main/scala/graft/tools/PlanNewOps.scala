package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the round-8 additions: q128 hybrid RRF, q129 domain
  * blocklist, q131 DSIR. Asserts the scale-critical shapes — bounded
  * TakeOrdered heads, broadcast-only joins on the small sides, no
  * corpus-wide single-partition exchange outside the <= nCand fusion
  * windows. */
object PlanNewOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    val rrf = graft.ext.Similarity.hybridRrfTopK(
      docs, "text", "doc_id", Seq("join", "spark", "dup"),
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") === 7), "embedding", k = 20, nCand = 50)
    val rrfPlan = rrf.queryExecution.executedPlan.toString
    println("== q128 TakeOrderedAndProject heads: " +
      "TakeOrderedAndProject".r.findAllIn(rrfPlan).length)
    println("== q128 sort-merge joins: " + "SortMergeJoin".r.findAllIn(rrfPlan).length)
    println(rrfPlan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("TakeOrdered"))
      .mkString("\n"))

    val blocked = {
      import spark.implicits._
      Seq("ex1.com", "site4.ex2.com").toDF("domain")
    }
    val urls = docs.select(col("doc_id"),
      concat(lit("http://h"), (col("doc_id") % 25).cast("string"),
        lit(".ex1.com/p")).as("url"))
    val bl = graft.ext.TextAnalysis.domainBlocklistFlags(
      urls, "url", "doc_id", blocked, "domain")
    val blPlan = bl.queryExecution.executedPlan.toString
    println("== q129 broadcast joins: " + "BroadcastHashJoin".r.findAllIn(blPlan).length)
    println("== q129 sort-merge joins: " + "SortMergeJoin".r.findAllIn(blPlan).length)

    val cont = graft.ext.Dedup.containmentPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.8)
    println("== q134 pairs rows: " + cont.count())
    val cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val ed = graft.ext.Dedup.editDistancePairs(cust, "s", "id", 1, 3)
    println("== q135 pairs rows: " + ed.count())
    val refs = cust.filter(col("id") % 5 === 0)
      .select((col("id") + 500000L).as("rid"),
        concat(substring(col("s"), 1, 10), lit("X"),
          substring(col("s"), 12, 100)).as("rs"))
    val ej = graft.ext.Dedup.editDistanceJoin(cust, "s", "id",
      refs, "rs", "rid", 1, 3)
    println("== q136 pairs rows: " + ej.count())
    // overflow reports are EMPTY on the gate corpora: the caps never
    // fired, so the pair sets above are complete (the audit claim)
    println("== q134 overflow rows: " + graft.ext.Dedup
      .containmentOverflow(docs, "text", "doc_id").count())
    println("== q135 overflow rows: " + graft.ext.Dedup
      .editDistanceOverflow(cust, "s", "id", 1, 3).count())
    println("== q136 overflow rows: " + graft.ext.Dedup
      .editDistanceJoinOverflow(cust, "s", "id", refs, "rs", "rid", 1, 3)
      .count())

    val dsir = graft.ext.TextAnalysis.dsirResample(docs, "text", "doc_id",
      docs.filter(col("doc_id") % 10 === 3), "text", k = 100, buckets = 4096)
    val dsirPlan = dsir.queryExecution.executedPlan.toString
    println("== q131 TakeOrderedAndProject: " +
      "TakeOrderedAndProject".r.findAllIn(dsirPlan).length)
    println("== q131 broadcast joins: " + "BroadcastHashJoin".r.findAllIn(dsirPlan).length)
    println("== q131 sort-merge joins: " + "SortMergeJoin".r.findAllIn(dsirPlan).length)
    println("== q131 singlePartition exchanges: " +
      "Exchange SinglePartition".r.findAllIn(dsirPlan).length)
    println(dsirPlan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("TakeOrdered"))
      .mkString("\n"))

    // ---- round-9 additions ----
    // q142 resolvePairs: the top-1 window must partition by id (never a
    // corpus-wide single-partition window)
    val res = graft.ext.Dedup.resolvePairs(ej)
    val resPlan = res.queryExecution.executedPlan.toString
    println("== q142 singlePartition exchanges: " +
      "Exchange SinglePartition".r.findAllIn(resPlan).length)
    println("== q142 window partitioned: " +
      resPlan.linesIterator.exists(l => l.contains("Window") &&
        !l.contains("SinglePartition")))
    println("== q142 rows: " + res.count())
    // q143 encode join: vocab side broadcast at gate scale (AQE picks
    // it from runtime stats — no pinned hint), zero sort-merge
    val enc = graft.ext.TextAnalysis.bpeSegmentCounts(docs, "text",
      "doc_id", rounds = 3)
    enc.collect()
    val encPlan = enc.queryExecution.executedPlan.toString
    println("== q143 broadcast joins: " +
      "BroadcastHashJoin".r.findAllIn(encPlan).length)
    println("== q143 sort-merge joins: " + "SortMergeJoin".r.findAllIn(encPlan).length)
    // q139 keepers: the exact pre-stage is ONE map-side-combined agg
    // (HashAggregate pair) on the text key; output matches the
    // no-duplicate corpus path
    val kept = graft.ext.Dedup.editDistanceKeepers(cust, "s", "id", 1, 3)
    println("== q139 keepers rows: " + kept.count())
    spark.stop()
  }
}
