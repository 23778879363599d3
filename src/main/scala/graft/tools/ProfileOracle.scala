package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TextFunctions}
import graft.ext.TextFunctions._

/** Feasibility measurements for oracle-izing the q28/q29/q32/q35/q40 gates. */
object ProfileOracle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TextFunctions.registerAll(spark)
    import spark.implicits._

    for (sf <- Seq("0.01", "0.1")) {
      println(s"== sf$sf")
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")

      // exact char-5 jaccard pairs at 0.8 (via sorted merge on shingle sets)
      val sh = docs.select(col("doc_id").as("id"),
        char_shingles(col("text"), lit(5)).as("sh")).persist()
      val exactPairs = sh.crossJoin(sh.select(col("id").as("id2"), col("sh").as("sh2")))
        .filter(col("id") < col("id2"))
        .withColumn("c", sorted_overlap(col("sh"), col("sh2")))
        .withColumn("j", col("c").cast("double") / (size(col("sh")) + size(col("sh2")) - col("c")))
        .filter(col("j") >= 0.8)
        .select("id", "id2").persist()
      val nExact = exactPairs.count()

      val mh = Dedup.minhashPairs(docs, "text", "doc_id",
        shingleSize = 5, numHashes = 128, bands = 32, threshold = 0.5)
        .select("id", "id2")
      val mhCaught = mh.join(exactPairs, Seq("id", "id2")).count()

      val shp = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 8)
        .select("id", "id2")
      val shCaught = shp.join(exactPairs, Seq("id", "id2")).count()
      println(s"  exact(J>=0.8)=$nExact minhash_caught=$mhCaught simhash_caught=$shCaught")

      // knn recall vs brute force
      val queries = emb.filter(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 10)
        .select(col("query_id"), col("corpus_id"))
      val lsh = Similarity.lshTopK(emb, queries, "embedding", "vec_id",
        k = 10, nbits = 4, probes = 16).select(col("query_id"), col("corpus_id"))
      val lshHits = lsh.join(exact, Seq("query_id", "corpus_id"))
        .groupBy("query_id").count().orderBy("query_id")
        .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
      val model = graft.ext.Ivf.train(emb, "embedding", k = 8, maxIter = 5)
      val assigned = graft.ext.Ivf.assign(emb, "embedding", model)
      val ivf = graft.ext.Ivf.search(assigned, queries, model, "embedding", "vec_id",
        k = 10, nprobe = 3).select(col("query_id"), col("corpus_id"))
      val ivfHits = ivf.join(exact, Seq("query_id", "corpus_id"))
        .groupBy("query_id").count().orderBy("query_id")
        .collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
      println(s"  lsh hits/10: $lshHits")
      println(s"  ivf hits/10: $ivfHits")

      // langid accuracy per true lang
      val acc = docs.groupBy("lang").agg(count(lit(1)).as("n"),
        sum(when(lang_id(col("text")) === col("lang"), 1).otherwise(0)).as("m"))
        .orderBy("lang")
        .collect().map(r => s"${r.get(0)}:${r.get(1)}/${r.get(2)}").mkString(" ")
      println(s"  langid n/match: $acc")
      sh.unpersist(); exactPairs.unpersist()
    }
    spark.stop()
  }
}
