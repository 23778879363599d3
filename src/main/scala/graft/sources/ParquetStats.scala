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

  /**
   * Exact row count of a DataFrame from parquet FOOTERS — no Spark job —
   * when (and only when) the plan provably preserves the scan's row
   * count: chains of Project/SubqueryAlias (and Union, summing children)
   * over a parquet file-source relation. Filters, joins, aggregates, or
   * non-parquet sources return None and the caller falls back to
   * `count()`. The footer sum equals `count()` EXACTLY (parquet footers
   * record exact row counts), so substituting it can never change
   * downstream behavior — it only deletes a job: at 100 TB that job is a
   * full file-listing scan stage; the footer path is O(#files) metadata
   * reads on the driver.
   */
  def planRowCount(df: org.apache.spark.sql.DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sessionState.newHadoopConf()
    def walk(p: LogicalPlan): Option[Long] = p match {
      case Project(_, child)       => walk(child)
      case SubqueryAlias(_, child) => walk(child)
      case u: Union =>
        val counts = u.children.map(walk)
        if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation
            if fs.fileFormat.isInstanceOf[
              org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
          try Some(fs.location.inputFiles.map { f =>
            val rd = ParquetFileReader.open(
              HadoopInputFile.fromPath(new HPath(f), conf))
            try rd.getRecordCount finally rd.close()
          }.sum)
          catch { case _: java.io.IOException => None }
        case _ => None
      }
      case _ => None
    }
    walk(df.queryExecution.analyzed)
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
