package graft

import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming windowed stats over events dir == batch equivalent") {
    val dir = "/root/testdata/sf0.001/events.parquet"
    val batch = EventStream.windowedStatsBatch(
      EventStream.loadEvents(spark, dir), "1 hour")
    val expected = batch.collect().map(_.toSeq).toSet

    // file-stream source needs a directory; stage the single file into one
    val stageDir = tmpDir("evt-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(stageDir, "events.parquet"))
    val stream = EventStream.windowedStats(
      EventStream.read(spark, stageDir), "1 hour", "10 minutes")
    val qname = s"evt_${System.nanoTime}"
    val q = stream.writeStream
      .format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(qname).collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("collection change-feed streams inserted rows") {
    import org.apache.spark.sql.functions._
    val db = new graft.engine.GeoDb(spark, tmpDir("feed-wh"), "geodb_user")
    db.createCollection("feed", Seq("v" -> "integer"))
    import spark.implicits._
    db.insertIntoCollection("feed", Seq(1, 2, 3).toDF("v")
      .withColumn("geometry", lit("POINT(0 0)")))
    val qname = s"feed_${System.nanoTime}"
    val q = EventStream.collectionFeed(db, "feed")
      .groupBy().agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table(qname).as[Long].head() == 3L)
  }

  test("sessionization batch shape") {
    val dir = "/root/testdata/sf0.001/events.parquet"
    val events = graft.streaming.EventStream.loadEvents(spark, dir)
    val sess = EventStream.sessionized(events, "30 minutes")
    // batch execution of session_window also works
    val n = sess.count()
    assert(n > 0)
  }
}
