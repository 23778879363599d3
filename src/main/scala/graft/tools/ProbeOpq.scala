package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

object ProbeOpq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    // exact L2 top-10 for vec 7 at sf0.01 (DuckDB-verified)
    val exactTop = Set(7L, 340L, 425L, 209L, 334L, 381L, 445L, 221L, 302L, 0L)
    for ((m, k) <- Seq((4, 16), (8, 16), (4, 64))) {
      val pq = Similarity.pqTrain(emb, "embedding", "vec_id", m, k, 2)
      val pqErr = Similarity.pqReconstructionError(
        emb.withColumn("_d", transform(col("embedding"), _.cast("double"))),
        "_d", pq)
      val opq = Similarity.opqTrain(emb, "embedding", "vec_id", m, k, 2)
      val rot = graft.ext.Pca.transform(emb, "embedding", opq.pca, "_r")
        .withColumn("_opq", array(opq.perm.map(i =>
          element_at(col("_r"), i + 1)): _*))
      val opqErr = Similarity.pqReconstructionError(rot, "_opq", opq.pq)
      println(s"PROBE m=$m k=$k pqErr=$pqErr opqErr=$opqErr " +
        s"ratio=${opqErr / pqErr}")
      // recall: refine top-10 vs exact top-10
      val codes = Similarity.opqEncode(emb, "embedding", "vec_id", opq)
      val ref = Similarity.opqSearchAdcRefine(codes, emb, "embedding",
        "vec_id", opq, query, 10, 50).collect().map(_.getLong(0)).toSet
      println(s"PROBE refine_ids=${ref.toSeq.sorted}")
      // raw ADC recall@10 (pre-refine) for both
      val adcO = Similarity.opqSearchAdc(codes, "vec_id", opq, query, 10)
        .collect().map(_.getLong(0)).toSet
      val codesP = Similarity.pqEncode(emb, "embedding", "vec_id", pq)
      val adcP = Similarity.pqSearchAdc(codesP, "vec_id", pq, query, 10)
        .collect().map(_.getLong(0)).toSet
      println(s"PROBE adc_opq=$adcO adc_pq=$adcP")
      // ADC rank positions of the exact top-10 under OPQ-ADC
      val full = Similarity.opqSearchAdc(codes, "vec_id", opq, query, 500)
        .collect().map(_.getLong(0)).zipWithIndex.toMap
      println(s"PROBE exact_top10_adc_ranks=" +
        exactTop.toSeq.sorted.map(id => id -> full(id)).toMap.toSeq.sortBy(_._2))
      for (rr <- Seq(100, 150, 200)) {
        val r = Similarity.opqSearchAdcRefine(codes, emb, "embedding",
          "vec_id", opq, query, 10, rr).collect().map(_.getLong(0)).toSet
        println(s"PROBE rerank=$rr exact_match=${r == exactTop}")
      }
    }
    spark.stop()
  }
}
