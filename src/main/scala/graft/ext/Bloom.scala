package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.util.sketch.BloomFilter

/**
 * Persisted BLOOM membership side artifact + exact anti-membership —
 * the prefilter that makes "is this key already in the corpus?" cheap
 * at 100 TB. The ingest side tables ([[graft.streaming.EventStream]]'s
 * urlset/md5set) already avoid rescanning corpus TEXT, but every batch
 * still anti-joins against the full slim key table. A Bloom filter of
 * those keys (Bloom 1970; Spark's own
 * `org.apache.spark.util.sketch.BloomFilter`, the engine's runtime-
 * filter implementation — built via the internal [[BloomFilterAggregate]]
 * over `xxhash64`, codegen'd end to end) answers "definitely new" for
 * the overwhelming majority of a typical batch WITHOUT touching the
 * side table; only the bloom-positive minority is verified EXACTLY —
 * by `isin` pushdown into the side table's parquet scan when few
 * (row-group pruning reads KBs of a TB-scale key table), by a plain
 * anti-join otherwise. No false drops are possible: Bloom filters have
 * no false negatives, and every positive is exactly verified.
 *
 * The side artifact is ONE parquet row — (sketch, n_added,
 * expected_items, num_bits, batches) — OR-maintained per batch:
 * merging a batch's bloom is bitwise-idempotent AND batch-id-keyed
 * (the ingestSink recipe), so checkpoint replays are no-ops.
 */
object Bloom {

  /** Aggregate column building a bloom of `value` (via xxhash64) sized
    * for `expectedItems` at `fpp`. Internal expression through the
    * sanctioned bridge — `bloom_filter_agg` has no public SQL name. */
  def bloomAgg(value: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"bloomAgg: expectedItems > 0, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"bloomAgg: fpp in (0, 1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(value)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** `might_contain(bloomBytes, xxhash64(value))` — true for every
    * member (no false negatives), rarely true for non-members. NULL
    * values yield false (a NULL key equals no stored key under SQL
    * join semantics). */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    when(value.isNull, lit(false)).otherwise(
      Bridge.column(BloomFilterMightContain(Literal(bloomBytes),
        Bridge.expression(xxhash64(value)))))

  /** Build (or rebuild) the membership side artifact from the full key
    * set: one parquet row (sketch, n_added, expected_items, num_bits,
    * batches=[]). Size `expectedItems` for the CORPUS LIFETIME —
    * appends refuse past saturation rather than silently degrading the
    * false-positive rate. */
  def writeMembershipBloom(df: DataFrame, keyCol: String, dir: String,
                           expectedItems: Long, fpp: Double = 0.01): Unit = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = df.agg(bloomAgg(col(keyCol), expectedItems, fpp).as("sketch"),
      count(col(keyCol)).as("n_added")).head()
    // an empty key set aggregates to a NULL sketch — persist a real
    // (empty) filter so the artifact is always loadable/appendable
    // (the first-batch bootstrap of a maintained side artifact)
    val bytes = Option(agg.getAs[Array[Byte]]("sketch")).getOrElse {
      val bos = new ByteArrayOutputStream()
      BloomFilter.create(expectedItems, numBits).writeTo(bos)
      bos.toByteArray
    }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((bytes, agg.getAs[Long]("n_added"), expectedItems, numBits,
      Seq.empty[Long]))
      .toDF("sketch", "n_added", "expected_items", "num_bits", "batches")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** (bloomBytes, nAdded, expectedItems, numBits, mergedBatchIds). */
  def loadBloom(spark: SparkSession, dir: String)
      : (Array[Byte], Long, Long, Long, Seq[Long]) = {
    val r = spark.read.parquet(dir).head()
    (r.getAs[Array[Byte]]("sketch"), r.getAs[Long]("n_added"),
      r.getAs[Long]("expected_items"), r.getAs[Long]("num_bits"),
      r.getAs[scala.collection.Seq[Long]]("batches").toSeq)
  }

  /** OR-merge one batch's keys into the side artifact. Idempotent two
    * ways: a replayed `batchId` is skipped outright, and even a raced
    * double-merge is bitwise harmless (OR is idempotent). Refuses past
    * saturation — a bloom filled beyond `expected_items` silently
    * loses its false-positive bound, which would silently inflate the
    * exact-verify load; rebuild with a larger budget instead. */
  def appendMembershipBloom(rows: DataFrame, keyCol: String, batchId: Long,
                            dir: String): Unit = {
    val spark = rows.sparkSession
    val (oldBytes, nAdded, expectedItems, numBits, batches) =
      loadBloom(spark, dir)
    if (batches.contains(batchId)) return // checkpoint replay — no-op
    val agg = rows.agg(
      Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(keyCol))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
        .as("sketch"),
      count(col(keyCol)).as("n")).head()
    val batchN = agg.getAs[Long]("n")
    require(nAdded + batchN <= expectedItems,
      s"appendMembershipBloom: ${nAdded + batchN} keys would exceed the " +
        s"expected_items=$expectedItems budget this bloom was sized for — " +
        "its false-positive bound no longer holds. Rebuild with " +
        "writeMembershipBloom(expectedItems = <lifetime corpus keys>).")
    val merged =
      if (batchN == 0L) oldBytes // empty batch: aggregate yields NULL sketch
      else {
        val f = BloomFilter.readFrom(new ByteArrayInputStream(oldBytes))
        f.mergeInPlace(BloomFilter.readFrom(
          new ByteArrayInputStream(agg.getAs[Array[Byte]]("sketch"))))
        val bos = new ByteArrayOutputStream(); f.writeTo(bos); bos.toByteArray
      }
    import spark.implicits._
    // every input is already materialized on the driver (loadBloom and
    // the aggregate both collected), so overwriting in place is safe
    Seq((merged, nAdded + batchN, expectedItems, numBits,
      (batches :+ batchId).sorted))
      .toDF("sketch", "n_added", "expected_items", "num_bits", "batches")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** EXACT anti-membership at side-table scale: rows of `left` whose
    * `keyCol` is absent from `side.sideKeyCol` — the result is
    * bit-identical to `left LEFT ANTI JOIN side`, but the side table
    * is only consulted for the bloom-positive minority. When those
    * distinct maybe-keys number ≤ `maxIsinKeys` the verify is an
    * `isin` filter that PUSHES INTO the side table's parquet scan
    * (row-group pruning — KBs read from a TB key table); past the
    * guard it falls back to an anti-join of just the maybe rows. NULL
    * keys pass through (SQL anti-join semantics). */
  def antiMembership(left: DataFrame, keyCol: String, side: DataFrame,
                     sideKeyCol: String, bloomBytes: Array[Byte],
                     maxIsinKeys: Int = 4096): DataFrame = {
    val maybe = mightContain(bloomBytes, col(keyCol))
    val maybeKeys = left.filter(maybe).select(col(keyCol))
      .distinct().limit(maxIsinKeys + 1).collect().map(_.get(0))
    if (maybeKeys.isEmpty) return left // whole batch definitely new
    if (maybeKeys.length <= maxIsinKeys) {
      // exact membership of the few candidates, pushed into the scan
      val present = side
        .filter(col(sideKeyCol).isin(maybeKeys.toIndexedSeq: _*))
        .select(col(sideKeyCol)).distinct().collect().map(_.get(0))
      if (present.isEmpty) left
      else left.filter(col(keyCol).isNull ||
        !col(keyCol).isin(present.toIndexedSeq: _*))
    } else {
      // maybe-heavy batch: anti-join ONLY the maybe rows; the bloom
      // still spared the definite-new majority the shuffle
      val slim = side.select(col(sideKeyCol).as("_bloom_side_key")).distinct()
      val checked = left.filter(maybe && col(keyCol).isNotNull)
        .join(slim, col(keyCol) === col("_bloom_side_key"), "left_anti")
      left.filter(!maybe || col(keyCol).isNull).unionByName(checked)
    }
  }
}
