package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-aware join utilities. AQE's skew-join handler
 * (`spark.sql.adaptive.skewJoin.enabled`) splits oversized SORT-MERGE
 * partitions at runtime, but it only fires for sort-merge joins, only
 * per its size thresholds, and not at all for aggregations feeding the
 * join or for broadcast-ineligible shuffled-hash plans. [[saltedJoin]]
 * is the explicit, planner-independent tool: salt the skewed side with
 * a deterministic hash in `[0, nSalts)`, replicate the other side
 * `nSalts` times, and join on `(keys..., salt)` — the hot key's rows
 * spread over `nSalts` shuffle partitions instead of one straggler
 * task, at the cost of writing the small side `nSalts` times into the
 * shuffle. Row-identical to the plain join (a spec pins it).
 *
 * The salt must be DETERMINISTIC per row (task retries and speculative
 * execution re-run partitions; a `rand()` salt would send a retried
 * row to a different partition and break exactly-once shuffle
 * semantics) — it is `xxhash64` of the whole row by default, or of
 * `saltBy` when a cheaper/stabler handle exists (e.g. a row id).
 *
 * 100 TB framing: use for the "one key holds 20% of the fact table"
 * joins where the replicated side is small-ish but above the broadcast
 * threshold (below it, `broadcast()` already avoids the shuffle
 * entirely and needs no salt). `nSalts` trades replication volume for
 * parallelism; the hot partition shrinks by `1/nSalts`.
 */
object Skew {

  private val SaltCol = "_graft_salt"

  /**
   * Equi-join `big` to `small` on `keys` with the big side salted.
   * Supported join types: `inner`, `left` (big-preserving),
   * `left_semi`, `left_anti` — exactly the types whose semantics
   * survive replicating `small` (a right/full/right-preserving join
   * would emit `nSalts` copies of every unmatched small row, so those
   * are REFUSED loudly).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 nSalts: Int, joinType: String = "inner",
                 saltBy: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "saltedJoin: empty key list")
    require(nSalts >= 2 && nSalts <= 4096,
      s"saltedJoin: nSalts in [2, 4096], got $nSalts")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")(jt),
      s"saltedJoin: join type '$joinType' would duplicate unmatched " +
      "rows of the replicated side — only inner/left/left_semi/" +
      "left_anti survive salting")
    Seq(big, small).foreach { df =>
      require(!df.columns.contains(SaltCol),
        s"saltedJoin: input already has a '$SaltCol' column — rename it")
      keys.foreach(k => require(df.columns.contains(k),
        s"saltedJoin: key '$k' missing from ${df.columns.mkString("[", ",", "]")}"))
    }
    val saltSrc = saltBy.getOrElse(struct(big.columns.map(col).toSeq: _*))
    val saltedBig = big.withColumn(SaltCol, pmod(xxhash64(saltSrc), lit(nSalts)))
    val saltedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedBig.join(saltedSmall, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
