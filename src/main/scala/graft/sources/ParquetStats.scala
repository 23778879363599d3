package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/**
 * Footer-level parquet statistics — the engine's replacement for the
 * reference's planner-statistics estimators (SURVEY.md §4 R1/R2,
 * geodb.sql:1276-1303 estimated count, geodb.sql:443-458 estimated extent):
 * O(#files) metadata reads, no data scan, and exact rather than approximate.
 */
object ParquetStats {

  /** Sum of footer record counts for a parquet file or directory. */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return -1L
    val files =
      if (fs.getFileStatus(p).isFile) Seq(p)
      else fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Total on-disk bytes for a parquet file or directory. */
  def sizeBytes(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }
}
