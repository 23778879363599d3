package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the salted-join effect on a planted hot key: lineitem at
  * sf0.1 with ~25% of rows on ONE supplier key, joined to a supplier
  * dim with broadcast and AQE skew handling DISABLED (simulating the
  * above-threshold dim + shuffled-hash regime where neither rescue
  * fires), plain vs Skew.saltedJoin at several nSalts. */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_SKEW_REP", "10").toInt
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("_r", explode(sequence(lit(1), lit(rep))))
      .select(
        when(col("l_orderkey") % 4 === 0, lit(1L))
          .otherwise(pmod(col("l_suppkey") * 13 + col("_r") * 101, lit(1000)) + 1)
          .as("suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    li.persist().count(); sup.persist().count()

    def time(name: String)(f: => Long): Unit = {
      // warm once, then min of 5 with GC quiescence (the bench recipe)
      f
      val runs = (1 to 5).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"== $name%-28s min ${runs.min}%6.2f s  (runs ${runs.map(r => f"$r%.2f").mkString(" ")})")
    }

    time("plain join") {
      li.join(sup, Seq("suppkey"))
        .agg(sum(col("l_quantity") * col("l_extendedprice") *
          (lit(1.0) - col("l_discount")))).collect()(0).getDouble(0).toLong
    }
    for (n <- Seq(4, 8, 16, 32)) {
      time(s"salted nSalts=$n") {
        graft.ext.Skew.saltedJoin(li, sup, Seq("suppkey"), nSalts = n)
          .agg(sum(col("l_quantity") * col("l_extendedprice") *
            (lit(1.0) - col("l_discount")))).collect()(0).getDouble(0).toLong
      }
    }
    spark.stop()
  }
}
