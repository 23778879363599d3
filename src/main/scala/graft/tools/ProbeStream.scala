package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: run the q254 stream-stream geodesic co-location shape
  * and print each micro-batch's durationMs breakdown + state metrics —
  * where does the wall actually go (addBatch? state commit? planning?). */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // measurement knob (VERDICT r15 #5): GRAFT_STATE_PROVIDER=rocksdb
    // flips the state store to RocksDB + changelog checkpointing so the
    // per-batch commit floor can be compared against the HDFS-backed
    // default on the same fixture
    sys.env.get("GRAFT_STATE_PROVIDER").foreach {
      case "rocksdb" =>
        builder.config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        builder.config(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
      case other => throw new IllegalArgumentException(
        s"GRAFT_STATE_PROVIDER: unknown provider '$other'")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.streaming.Trigger
    for (round <- 1 to 3) {
      val stage = java.nio.file.Files.createTempDirectory("graft-probe-st")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
        stage.resolve("events.parquet"))
      val a = graft.streaming.EventStream.read(spark, stage.toString)
        .filter(col("event_id") % 2 === 0).select(
          col("event_id").as("a_id"),
          (((col("event_id") * 29) % 1200).cast("double") / 10.0 - 60.0).as("alat"),
          (((col("event_id") * 43) % 3600).cast("double") / 10.0 - 180.0).as("alon"),
          (((col("event_id") * 7) % 3000).cast("double") + 86400.0).as("at"))
      val b = graft.streaming.EventStream.read(spark, stage.toString)
        .filter(col("event_id") % 2 === 1).select(
          col("event_id").as("b_id"),
          (((col("event_id") * 23) % 1200).cast("double") / 10.0 - 60.0).as("blat"),
          (((col("event_id") * 41) % 3600).cast("double") / 10.0 - 180.0).as("blon"),
          (((col("event_id") * 11) % 3000).cast("double") + 86400.0).as("bt"))
      val out = graft.core.DistanceJoin.geoSpaceTimeJoinStream(a, b,
          "alat", "alon", "at", "blat", "blon", "bt",
          radiusMeters = 500000.0, tau = 60.0, watermarkDelay = "2 hours")
        .select(col("a_id"), col("b_id"), col("dt").cast("long").as("dti"))
      val qname = "probe_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"ROUND $round wall $wall%.2f s, rows ${spark.table(qname).count()}")
      q.recentProgress.foreach { p =>
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs} " +
          s"state=${p.stateOperators.map(s0 => s"rowsTotal=${s0.numRowsTotal} " +
            s"updated=${s0.numRowsUpdated} commitMs=${s0.allUpdatesTimeMs}/" +
            s"removeMs=${s0.allRemovalsTimeMs}/commit=${s0.commitTimeMs}").mkString(";")}")
      }
    }
    spark.stop()
  }
}
