package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 probes (the ScaleProbe12 recipe). Measurement only — gates
  * never read these outputs.
  *
  *  1. backoff-LM PRUNED regime: round 12's 10x probe ratio was 2.2
  *     because the broadcast count tables grow with vocab; `minCount`
  *     pruning is the documented 100 TB answer — this measures it
  *     (count-table rows + score time, minCount 1 vs 2, 1x vs 10x).
  *  2. kNN join with a WIDE left payload: whole-row grouping carries
  *     the payload through every per-round shuffle; the `lIdCol`
  *     variant carries (id, x, y) and joins the payload back once —
  *     measured as total shuffle-write bytes via a task-metrics
  *     listener, plus wall time.
  *  3. geodesic radius join at constant density, 1x vs 10x (the q220
  *     operator's per-row-work flatness check).
  */
object ScaleProbe13 {
  private val root = "/tmp/graft_scale13"

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

    val shuffleW = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def time3(label: String)(df: => DataFrame): Unit = {
      System.gc()
      val times = (1 to 3).map { _ =>
        Thread.sleep(500) // listener drain from the previous run
        val s0 = shuffleW.get()
        val t0 = System.nanoTime()
        val d = df
        val r = d.select(count(lit(1)).as("n"),
          bit_xor(xxhash64(struct(d.columns.map(col): _*))).as("h")).head()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        ((dt, shuffleW.get() - s0), r.getLong(0))
      }
      val best = times.map(_._1).minBy(_._1)
      println(f"SCALE13 $label%-34s min=${best._1}%.3f s " +
        f"shufMB=${times.map(_._1._2).min / 1e6}%.1f rows=${times.head._2}")
    }

    import graft.core.DistanceJoin
    import graft.ext.NgramLm

    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs10Path = s"$root/documents10.parquet"
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    if (want("backoffLm")) {
      (0 until 10).map { i =>
        val rot = alpha.drop(i * 7 % 26) + alpha.take(i * 7 % 26)
        docs1.select((col("doc_id") + i * 1000000L).as("doc_id"),
          translate(col("text"), alpha, rot).as("text"))
      }.reduce(_ unionAll _)
        .repartition(32).write.mode("overwrite").parquet(docs10Path)
      val docs10 = spark.read.parquet(docs10Path)
      for ((label, docs) <- Seq(("1x", docs1), ("10x", docs10));
           mc <- Seq(1L, 2L)) {
        val ref = docs.filter(col("doc_id") % 10 < 3)
        val m = NgramLm.trainModel(ref, "text", minCount = mc)
        println(s"SCALE13 lmTables $label minCount=$mc " +
          s"u1=${m.u1.count()} b2=${m.b2.count()} t3=${m.t3.count()}")
        time3(s"backoffLm $label minCount=$mc")(
          NgramLm.scoreWithModel(docs, "text", "doc_id", m))
      }
    }

    if (want("knnWide")) {
      // constant-density plane, 30k lefts each dragging a ~2 KB payload
      def pts(n: Long, side: Double, seed: Int): DataFrame =
        spark.range(n).select(col("id"),
          (pmod(xxhash64(col("id") + seed), lit(1000000)).cast("double")
            / 1e6 * side).as("x"),
          (pmod(xxhash64(col("id") + seed + 7), lit(1000000)).cast("double")
            / 1e6 * side).as("y"))
      val l = pts(30000, 1000.0, 1)
        .select(col("id").as("lid"), col("x").as("lx"), col("y").as("ly"),
          concat_ws("", (0 until 64).map(i =>
            md5(concat(col("id").cast("string"), lit(i)))): _*).as("payload"))
        .localCheckpoint()
      val r = pts(3000, 1000.0, 99).toDF("rid", "rx", "ry").localCheckpoint()
      time3("knn wide payload WHOLE-ROW")(
        DistanceJoin.knnJoin(l, r, "lx", "ly", "rx", "ry", "rid", k = 3,
          startRadius = 25.0, maxRadius = 4096.0))
      time3("knn wide payload lIdCol")(
        DistanceJoin.knnJoin(l, r, "lx", "ly", "rx", "ry", "rid", k = 3,
          startRadius = 25.0, maxRadius = 4096.0, lIdCol = Some("lid")))
      time3("nearest wide payload WHOLE-ROW")(
        DistanceJoin.nearestJoin(l, r, "lx", "ly", "rx", "ry", "rid",
          startRadius = 25.0, maxRadius = 4096.0))
      time3("nearest wide payload lIdCol")(
        DistanceJoin.nearestJoin(l, r, "lx", "ly", "rx", "ry", "rid",
          startRadius = 25.0, maxRadius = 4096.0, lIdCol = Some("lid")))
    }

    if (want("hotCell")) {
      // one cell holds ~40% of the left side (the hot-city shape the
      // saltCells knob exists for): 2M hot lefts in a 25-unit cell +
      // 3M background over a 1000-unit plane, rights uniform.
      // Broadcast is DISABLED for this section: with the right side
      // broadcast there is no shuffle and no straggler — the first run
      // of this probe measured salting as pure overhead there (15.0 vs
      // 10.5 s), which is the documented floor: the knob is for
      // broadcast-INELIGIBLE right sides (the regime Skew.saltedJoin
      // itself documents), simulated here by the threshold conf.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bg = spark.range(3000000).select(col("id").as("lid"),
        (pmod(xxhash64(col("id") + 1), lit(1000000)).cast("double")
          / 1e3).as("lx"),
        (pmod(xxhash64(col("id") + 8), lit(1000000)).cast("double")
          / 1e3).as("ly"))
      val hot = spark.range(2000000).select((col("id") + 10000000L).as("lid"),
        (pmod(xxhash64(col("id") + 2), lit(25000)).cast("double")
          / 1e3 + 500.0).as("lx"),
        (pmod(xxhash64(col("id") + 9), lit(25000)).cast("double")
          / 1e3 + 500.0).as("ly"))
      val l = bg.unionAll(hot).localCheckpoint()
      val r = spark.range(50000).select(col("id").as("rid"),
        (pmod(xxhash64(col("id") + 3), lit(1000000)).cast("double")
          / 1e3).as("rx"),
        (pmod(xxhash64(col("id") + 4), lit(1000000)).cast("double")
          / 1e3).as("ry")).localCheckpoint()
      time3("hotCell radiusJoin plain")(
        DistanceJoin.radiusJoin(l, r, "lx", "ly", "rx", "ry", 25.0))
      time3("hotCell radiusJoin saltCells=8")(
        DistanceJoin.radiusJoin(l, r, "lx", "ly", "rx", "ry", 25.0,
          saltCells = 8))
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    if (want("geoRadius")) {
      // constant surface density: points spread over a lat/lon window
      // whose AREA scales with n (lat in [-60, 60], lon window grows)
      def geoPts(n: Long, lonSpan: Double, seed: Int): DataFrame =
        spark.range(n).select(col("id"),
          (pmod(xxhash64(col("id") + seed), lit(1200000)).cast("double")
            / 1e4 - 60.0).as("lat"),
          (pmod(xxhash64(col("id") + seed + 7), lit(1000000)).cast("double")
            / 1e6 * lonSpan - 180.0).as("lon"))
      for ((label, scale) <- Seq(("1x", 1.0), ("10x", 10.0))) {
        val n = (20000 * scale).toLong
        val span = 36.0 * scale
        val gl = geoPts(n, span, 5).toDF("lid", "llat", "llon")
        val gr = geoPts(n / 10, span, 55).toDF("rid", "rlat", "rlon")
        time3(s"$label geoRadiusJoin 50km")(
          DistanceJoin.geoRadiusJoin(gl, gr, "llat", "llon",
            "rlat", "rlon", 50e3))
        time3(s"$label geoKnnJoin k=3")(
          DistanceJoin.geoKnnJoin(gl, gr, "llat", "llon",
            "rlat", "rlon", "rid", k = 3, startRadiusMeters = 50e3,
            maxRadiusMeters = 1.6e6, lIdCol = Some("lid")))
      }
    }
    spark.stop()
  }
}
