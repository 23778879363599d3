package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.GeoDb
import graft.functions.GeoFunctions._

/** Manual end-to-end smoke drive of the engine over real testdata. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").appName("smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wh = java.nio.file.Files.createTempDirectory("smoke-wh").toString
    val db = new GeoDb(spark, wh, "analyst")

    val sup = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .withColumn("geometry", st_astext(st_point(col("s_acctbal"), col("s_suppkey").cast("double"))))
      .select("s_name", "s_nationkey", "s_acctbal", "geometry")
    db.createCollection("suppliers", Seq("s_name" -> "text", "s_nationkey" -> "integer", "s_acctbal" -> "float"))
    db.insertIntoCollection("suppliers", sup)
    println("== inserted rows: " + db.countCollection("suppliers"))

    db.getCollection("suppliers", "s_nationkey=in.(1,2,3)&order=id&limit=5").show(5, false)

    db.getCollectionByBbox("suppliers", (0.0, 0.0, 5000.0, 100.0), "contains", 4326, limit = Some(3)).show(3, false)
    println("== bbox count: " + db.countCollectionByBbox("suppliers", (0.0, 0.0, 5000.0, 100.0), "contains", 4326))

    db.getCollectionPg("suppliers", select = "count(*) as ct, s_nationkey",
      group = Some("s_nationkey"), order = Some("ct desc"), limit = Some(3)).show()

    println("== extent: " + db.getCollectionBbox("suppliers"))
    println("== PLAN for bbox query:")
    db.getCollectionByBbox("suppliers", (0.0, 0.0, 5000.0, 100.0), "contains", 4326).explain("formatted")

    // user-path spatial query WITHOUT manual prefilter: the optimizer rule
    // must inject the _bbox_* conjuncts and push them to the scan
    println("== PLAN for direct user st_contains (rule-injected prefilter):")
    spark.read.parquet(wh + "/data/analyst/suppliers/data")
      .filter(st_contains(st_makeenvelope(lit(0.0), lit(0.0), lit(5000.0), lit(100.0)),
        col("geometry")))
      .explain("formatted")

    try db.getCollectionByBbox("suppliers", (0.0, 0.0, 1.0, 1.0), "bogus_mode")
    catch { case e: Exception => println("== probe bad mode -> " + e.getMessage.take(80)) }
    try db.getCollection("suppliers", "s_nationkey=badop.5")
    catch { case e: Exception => println("== probe bad op -> " + e.getMessage.take(80)) }
    try new GeoDb(spark, wh, "mallory").getCollection("suppliers", database = Some("analyst"))
    catch { case e: Exception => println("== probe ACL -> " + e.getMessage.take(90)) }
    try db.dropProperty("suppliers", "id")
    catch { case e: Exception => println("== probe drop mandatory -> " + e.getMessage.take(80)) }
    println("== eventlog:")
    db.getEventLog().groupBy("event_type").count().show()

    // ---- external geo sources -> engine ingest ----
    val srcDir = java.nio.file.Files.createTempDirectory("smoke-src").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(srcDir, "fc.geojson"),
      """{"type":"FeatureCollection","features":[{"type":"Feature","geometry":{"type":"Point","coordinates":[3,4]},"properties":{"k":1}}]}""")
    val imported = graft.sources.GeoSources.readGeoJson(spark, srcDir + "/fc.geojson")
    println("== geojson import rows: " + imported.count() + ", type: " +
      imported.select(graft.functions.GeoFunctions.geometry_type(col("geometry"))).head().getString(0))

    // ---- ext modules over real documents/embeddings/events tables ----
    graft.ext.TextFunctions.registerAll(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    println("== exact dedup groups: " +
      graft.ext.Dedup.exact(docs, "text", "doc_id").count() + " of " + docs.count())
    println("== minhash near-dup pairs (jaccard>=0.8): " +
      graft.ext.Dedup.minhashPairs(docs, "text", "doc_id").count())
    println("== simhash pairs (hamming<=3): " +
      graft.ext.Dedup.simhashPairs(docs, "text", "doc_id").count())
    graft.ext.TextAnalysis.profile(docs, "text", "doc_id")
      .orderBy("doc_id").show(3, false)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.ext.Similarity.bruteForceTopK(emb, emb.limit(2), "embedding", "vec_id", 3).show()
    println("== embedding near-dup pairs (cos>=0.95): " +
      graft.ext.Dedup.embeddingPairs(emb, "embedding", "vec_id").count())
    val ev = graft.streaming.EventStream.loadEvents(spark,
      "/root/testdata/sf0.001/events.parquet")
    graft.streaming.EventStream.windowedStatsBatch(ev, "1 day")
      .orderBy("window_start", "event_type").show(5)
    spark.stop()
    println("SMOKE_DONE")
  }
}
