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

  test("sessionization batch shape") {
    val dir = "/root/testdata/sf0.001/events.parquet"
    val events = graft.streaming.EventStream.loadEvents(spark, dir)
    val sess = EventStream.sessionized(events, "30 minutes")
    // batch execution of session_window also works
    val n = sess.count()
    assert(n > 0)
  }
}
