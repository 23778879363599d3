package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Small-files maintenance for the batch-partitioned ingest layout
 * (`<dir>/batch=<id>/part-*.parquet` — [[graft.streaming.EventStream.ingestSink]]'s
 * corpus and side tables): a year of daily batches is thousands of
 * partitions whose per-file size drifts far below the scan-efficient
 * target, and at 100 TB the file-listing + footer overhead becomes the
 * read bottleneck. `compactBatchTable` bin-packs CONTIGUOUS closed
 * batch ranges into single partitions `batch=c<lo>-<hi>` sized to
 * `targetBytes`, content-preservingly (row counts verified before any
 * delete) and idempotently (re-running after a crash completes the
 * interrupted group; a rerun over a compacted table is a no-op).
 *
 * Design constraints, in order:
 *  - **The streaming sink's replay contract survives.** Only batches
 *    strictly older than the `keepLatest` newest are touched — a
 *    checkpoint replay can only ever target the newest uncommitted
 *    batch, so compacted partitions are never overwrite targets.
 *  - **Schema is untouched.** Files carry no extra lineage column;
 *    range membership lives in the partition NAME. Readers that pass
 *    leaf directories (the sink, [[readAsOf]]) see identical schemas
 *    before and after.
 *  - **Snapshot granularity coarsens at compaction boundaries.** An
 *    as-of read inside a compacted range is REFUSED loudly (the rows
 *    of its sub-batches are no longer separable) — the Iceberg
 *    expire-snapshots trade, stated instead of silently mis-served.
 *    Pick bins aligned to the snapshots you need to keep.
 *  - **Crash windows are stated.** Per group: write tmp → verify count
 *    → rename to `batch=c<lo>-<hi>` → delete sources. A crash before
 *    the rename leaves only a dot-prefixed tmp (invisible to every
 *    reader; swept on the next run). A crash after the rename leaves
 *    range + sources both present — readers would double-count, so
 *    compaction is an OFFLINE maintenance op (no concurrent readers);
 *    the next run detects sources covered by an existing range and
 *    completes the delete (the range, having been verified, is
 *    authoritative).
 */
object Compact {

  /** One compaction group's outcome. */
  case class Group(label: String, lo: Long, hi: Long, srcParts: Int,
                   rows: Long, bytesBefore: Long, filesBefore: Int,
                   filesAfter: Int)

  /** `batch=<id>` or `batch=c<lo>-<hi>` → inclusive id range. */
  private[ext] def rangeOf(name: String): Option[(Long, Long)] = {
    if (!name.startsWith("batch=")) return None
    val v = name.stripPrefix("batch=")
    if (v.startsWith("c")) {
      val parts = v.stripPrefix("c").split("-", 2)
      if (parts.length == 2)
        try Some((parts(0).toLong, parts(1).toLong)) catch {
          case _: NumberFormatException => None
        }
      else None
    } else
      try { val id = v.toLong; Some((id, id)) } catch {
        case _: NumberFormatException => None
      }
  }

  private def listParts(spark: SparkSession, dir: String)
      : Seq[(Path, Long, Long, Long, Int)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"compact: $dir does not exist")
    fs.listStatus(p).toSeq.flatMap { st =>
      rangeOf(st.getPath.getName).map { case (lo, hi) =>
        val files = fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        (st.getPath, lo, hi, files.map(_.getLen).sum, files.size)
      }
    }.sortBy(_._2)
  }

  /**
   * Compact one batch-partitioned table. Returns the groups rewritten
   * this run (empty = table already compact). Partitions with
   * non-numeric values (e.g. the sink's `batch=_bootstrap`) are left
   * untouched; already-compacted ranges participate in further
   * compaction, so repeated runs converge to ~`targetBytes` files.
   */
  def compactBatchTable(spark: SparkSession, dir: String,
                        targetBytes: Long = 128L << 20,
                        keepLatest: Int = 1): Seq[Group] = {
    require(targetBytes > 0, s"targetBytes > 0, got $targetBytes")
    require(keepLatest >= 0, s"keepLatest >= 0, got $keepLatest")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // sweep tmp dirs from crashed runs (dot-prefixed: invisible to
    // readers, never referenced)
    if (fs.exists(p)) fs.listStatus(p).toSeq
      .filter(_.getPath.getName.startsWith(".compact_tmp_"))
      .foreach(st => fs.delete(st.getPath, true))
    val all = listParts(spark, dir)
    // self-heal a crash-after-rename: sources fully covered by an
    // existing larger range are stale — the range was count-verified
    // before its rename, so it is authoritative; complete the delete
    val healed = all.filter { case (path, lo, hi, _, _) =>
      val covered = all.exists { case (p2, lo2, hi2, _, _) =>
        p2 != path && lo2 <= lo && hi <= hi2 }
      if (covered) fs.delete(path, true)
      covered
    }
    val parts = all.filterNot(healed.contains)
    if (parts.size <= 1) return Nil
    // the keepLatest newest stay raw (streaming replay window)
    val closed = parts.dropRight(keepLatest)
    // contiguity guard: ranges must not interleave (they can't, by
    // construction — ids are disjoint and sorted)
    closed.sliding(2).foreach {
      case Seq((_, _, h1, _, _), (_, l2, _, _, _)) =>
        require(h1 < l2, s"compact: overlapping partitions in $dir")
      case _ => ()
    }
    // greedy contiguous bin-pack to targetBytes
    val groups = Seq.newBuilder[Seq[(Path, Long, Long, Long, Int)]]
    var cur = Seq.empty[(Path, Long, Long, Long, Int)]
    var curBytes = 0L
    closed.foreach { part =>
      cur :+= part
      curBytes += part._4
      if (curBytes >= targetBytes) {
        groups += cur; cur = Seq.empty; curBytes = 0L
      }
    }
    if (cur.nonEmpty) groups += cur
    groups.result().filter(_.size >= 2).map { g =>
      val lo = g.head._2
      val hi = g.last._3
      val srcPaths = g.map(_._1.toString)
      val src = spark.read.parquet(srcPaths: _*)
      val n = src.count()
      val bytes = g.map(_._4).sum
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val tmp = new Path(p, s".compact_tmp_${lo}_$hi")
      spark.read.parquet(srcPaths: _*).repartition(nOut)
        .write.mode("overwrite").parquet(tmp.toString)
      val written = spark.read.parquet(tmp.toString).count()
      require(written == n,
        s"compact: verify failed for batch range [$lo,$hi] — wrote " +
          s"$written rows, sources hold $n; sources NOT deleted")
      val dest = new Path(p, s"batch=c$lo-$hi")
      require(fs.rename(tmp, dest),
        s"compact: rename $tmp -> $dest failed; sources NOT deleted")
      g.foreach { case (path, _, _, _, _) => fs.delete(path, true) }
      val outFiles = fs.listStatus(dest).count(f => f.isFile &&
        !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      Group(s"c$lo-$hi", lo, hi, g.size, n, bytes,
        g.map(_._5).sum, outFiles)
    }
  }

  /** [[compactBatchTable]] over a whole ingest layout: the corpus plus
    * whichever of its side tables exist (`urlset`, `md5set`,
    * `minhash` — the bloom artifacts are single small files and need
    * no compaction). Same knobs for all; returns per-table groups. */
  def compactIngestLayout(spark: SparkSession, corpusDir: String,
                          targetBytes: Long = 128L << 20,
                          keepLatest: Int = 1): Map[String, Seq[Group]] = {
    val fs = new Path(corpusDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tables = Seq("corpus" -> corpusDir) ++
      Seq("urlset", "md5set", "minhash").flatMap { t =>
        val d = s"$corpusDir.side/$t"
        if (fs.exists(new Path(d))) Some(t -> d) else None
      }
    tables.map { case (name, d) =>
      name -> compactBatchTable(spark, d, targetBytes, keepLatest)
    }.toMap
  }

  /**
   * SCHEMA BACKFILL for the batch-partitioned layout: derive a new
   * column for every partition that lacks it, IN PLACE — the
   * "tokenizer adopted mid-corpus-life" problem
   * ([[graft.streaming.EventStream.ingestSink]]'s `tokenizerPath`
   * warns that flipping it mixes partition schemas; this repairs the
   * mix). `derive` must return the input rows with `colName` added —
   * row count is verified per partition before any swap, and row
   * identity is the caller's contract (a derive that filters or
   * duplicates is refused by the count check).
   *
   * Per partition: write tmp (dot-prefixed, invisible) → verify count
   * → rename original to a dot-prefixed `.backfill_old_` name →
   * promote tmp → delete the old copy. The crash window between the
   * two renames leaves the partition ABSENT but its `.backfill_old_`
   * copy intact; the next run (or any run) restores it before
   * proceeding — self-healing, same discipline as compaction's. Like
   * compaction, an OFFLINE maintenance op (a concurrent reader could
   * see the partition missing for the instant between renames).
   * Partitions that already carry `colName` are skipped untouched —
   * reruns are no-ops. Returns the partition names backfilled this
   * run.
   */
  def backfillBatchTable(spark: SparkSession, dir: String, colName: String,
                         derive: DataFrame => DataFrame): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p), s"backfill: $dir does not exist")
    // sweep crashed tmps; restore a crashed swap (partition absent but
    // its .backfill_old_ copy present — the rename pair was interrupted)
    fs.listStatus(p).toSeq.foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".backfill_tmp_")) fs.delete(st.getPath, true)
      else if (n.startsWith(".backfill_old_")) {
        val orig = new Path(p, n.stripPrefix(".backfill_old_"))
        if (!fs.exists(orig)) {
          require(fs.rename(st.getPath, orig),
            s"backfill: failed to restore $orig from crashed swap")
        } else fs.delete(st.getPath, true) // promoted already — finish
      }
    }
    val parts = fs.listStatus(p).toSeq.map(_.getPath)
      .filter(c => c.getName.startsWith("batch="))
    parts.flatMap { part =>
      val cur = spark.read.parquet(part.toString)
      if (cur.columns.contains(colName)) None
      else {
        val out = derive(cur)
        require(out.columns.contains(colName),
          s"backfill: derive did not add '$colName' (columns: " +
            out.columns.mkString(", ") + ")")
        val nIn = cur.count()
        val tmp = new Path(p, s".backfill_tmp_${part.getName}")
        out.write.mode("overwrite").parquet(tmp.toString)
        val nOut = spark.read.parquet(tmp.toString).count()
        require(nOut == nIn,
          s"backfill: derive changed ${part.getName}'s row count " +
            s"($nIn -> $nOut) — must be row-preserving; aborting before swap")
        val old = new Path(p, s".backfill_old_${part.getName}")
        require(fs.rename(part, old), s"backfill: rename $part -> $old failed")
        require(fs.rename(tmp, part), s"backfill: promote $tmp -> $part failed")
        fs.delete(old, true)
        Some(part.getName)
      }
    }
  }

  /**
   * SNAPSHOT DIFF — "what did the corpus gain between yesterday's and
   * today's snapshot": [[TextAnalysis.corpusDiff]] composed over two
   * [[readAsOf]] boundaries of the same batch-partitioned table. Both
   * boundaries obey readAsOf's refusal contract (a boundary inside a
   * compacted range refuses loudly). The ingest layout is append-only
   * (compaction is content-preserving), so `removed` rows indicate
   * external surgery — they are reported, not hidden. Output
   * (idCol, status ∈ added|removed|modified|unchanged).
   */
  def diffAsOf(spark: SparkSession, dir: String, fromBatch: Long,
               toBatch: Long, textCol: String, idCol: String): DataFrame = {
    require(fromBatch <= toBatch,
      s"diffAsOf: need fromBatch <= toBatch, got $fromBatch > $toBatch")
    TextAnalysis.corpusDiff(
      readAsOf(spark, dir, fromBatch), readAsOf(spark, dir, toBatch),
      textCol, idCol)
  }

  /**
   * SNAPSHOT read: the table as of batch `maxBatch` inclusive — every
   * partition whose id range lies at or below the boundary. REFUSES
   * loudly when the boundary falls strictly inside a compacted range
   * (those rows are no longer separable by batch); an empty selection
   * returns an empty frame with the table's schema.
   */
  def readAsOf(spark: SparkSession, dir: String, maxBatch: Long): DataFrame = {
    val parts = listParts(spark, dir)
    require(parts.nonEmpty, s"readAsOf: no batch partitions under $dir")
    parts.foreach { case (path, lo, hi, _, _) =>
      require(!(lo <= maxBatch && maxBatch < hi),
        s"readAsOf: snapshot boundary $maxBatch falls inside compacted " +
          s"range ${path.getName} — rows of its sub-batches are no " +
          "longer separable. Choose a boundary >= " + hi +
          ", or compact with bins aligned to the snapshots you keep.")
    }
    val keep = parts.filter(_._3 <= maxBatch).map(_._1.toString)
    if (keep.isEmpty)
      spark.read.parquet(parts.map(_._1.toString): _*).limit(0)
    else spark.read.parquet(keep: _*)
  }
}
