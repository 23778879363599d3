package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for the q205 backoff-LM path at sf0.1. */
object ProfileLm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ext.TextFunctions.registerAll(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val ref = docs.filter(col("doc_id") % 10 < 3)

    def time(label: String)(f: => Any): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"== $label%-26s min ${runs.min}%6.2f s (${runs.map(r => f"$r%.2f").mkString(" ")})")
    }

    time("trainModel (3 aggs+collect)") {
      graft.ext.NgramLm.trainModel(ref, "text")
    }
    val model = graft.ext.NgramLm.trainModel(ref, "text")
    time("scoreWithModel") {
      graft.ext.NgramLm.scoreWithModel(docs, "text", "doc_id", model)
        .select(count(lit(1))).head()
    }
    time("train+score (q205 shape)") {
      graft.ext.NgramLm.stupidBackoffScores(docs, "text", "doc_id", ref, "text")
        .select(count(lit(1))).head()
    }
    time("train+score full checksum") {
      val d = graft.ext.NgramLm.stupidBackoffScores(docs, "text", "doc_id",
        ref, "text")
      d.select(count(lit(1)),
        bit_xor(xxhash64(struct(d.columns.map(col): _*)))).head()
    }
    time("score-only full checksum") {
      val d = graft.ext.NgramLm.scoreWithModel(docs, "text", "doc_id", model)
      d.select(count(lit(1)),
        bit_xor(xxhash64(struct(d.columns.map(col): _*)))).head()
    }
    // isolate: grams explode only / joins only / +score / +decimal-sum
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
      t => length(t) > 0)
    time("grams explode only") {
      val g = docs.select(col("doc_id"), explode(transform(toks,
        (w, i) => struct(i.cast("int").as("i"), w.as("w"),
          when(i >= 1, element_at(toks, i)).as("p1"),
          when(i >= 2, element_at(toks, i - 1)).as("p2")))).as("g"))
        .select(col("doc_id"), col("g.*"))
      g.select(count(lit(1)), bit_xor(xxhash64(struct(g.columns.map(col): _*)))).head()
    }
    spark.stop()
  }
}
