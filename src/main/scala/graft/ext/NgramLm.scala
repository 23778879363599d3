package graft.ext

import graft.core.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-based n-gram language-model scoring with STUPID BACKOFF
 * (Brants et al. 2007, "Large Language Models in Machine Translation"
 * — the score real web-scale pipelines use where KenLM's Kneser-Ney is
 * too expensive to train; CCNet's perplexity filter is this family).
 * Complements [[TextAnalysis.trainBigramModel]] (Laplace-smoothed
 * bigram cross-entropy): a full trigram model with the backoff chain
 *
 *   S(w3 | w1 w2) = c3(w1 w2 w3) / c2(w1 w2)        if c3 > 0
 *                 = alpha * S(w3 | w2)               otherwise
 *   S(w2 | w1)    = c2(w1 w2) / c1(w1)               if c2 > 0
 *                 = alpha * S(w2)                    otherwise
 *   S(w)          = (c1(w) + 1) / (N + V)            (add-one floor,
 *                                                     so OOV tokens
 *                                                     score instead of
 *                                                     hitting ln 0)
 *
 * Scores are relative frequencies, not normalized probabilities —
 * Brants' deliberate trade (hence "S", not "P"). Per-token terms are
 * `round(ln S, 6)` (the repo-wide 6-dp pin that makes both engines'
 * 1-ulp `ln` classes produce the same comparable doubles) accumulated
 * as DECIMAL — the per-doc sum is order-independent and exactly
 * replayable — and emitted as a double.
 *
 * Scale: training is three corpus-scale aggregates (unigram / bigram /
 * trigram counts — the same shuffles any word-count pays); scoring
 * explodes each doc's positional grams ONCE (an index-aware
 * `transform` over the token array — no per-doc window, no sort) and
 * left-joins the slim count tables on their gram keys. AQE broadcasts
 * count tables that fit and shuffle-joins the ones that don't; at
 * web scale `minCount` prunes singleton grams (Brants' own frequency
 * cutoff), shrinking the trigram table by the Zipf tail — pruned
 * grams back off, a documented semantic, not an accident.
 */
object NgramLm {

  /**
   * Score `docs` under a stupid-backoff trigram model trained on
   * `ref`. Returns `(idCol, n_tokens, logscore)` — logscore = sum of
   * per-token `round(ln S, 6)` terms (0.0 for empty docs), n_tokens
   * the scored token count.
   *
   * @param alpha     backoff discount (Brants' 0.4 default)
   * @param minCount  keep only grams with count >= minCount in the
   *                  bigram/trigram tables (1 = keep all); pruned
   *                  grams score through the backoff chain
   */
  def stupidBackoffScores(docs: DataFrame, textCol: String, idCol: String,
                          ref: DataFrame, refTextCol: String,
                          alpha: Double = 0.4,
                          minCount: Long = 1): DataFrame =
    scoreWithModel(docs, textCol, idCol,
      trainModel(ref, refTextCol, minCount), alpha)

  /** The trained artifact: three count frames + the normalization
    * scalars. `n`/`v` are unpruned totals (pruning the unigram floor
    * would re-normalize OOV scores, not shrink state — the floor table
    * is the Zipf HEAD by definition). */
  final case class Model(u1: DataFrame, b2: DataFrame, t3: DataFrame,
                         n: Long, v: Long)

  /** Train the count tables on `ref` — three corpus-scale aggregates;
    * `minCount` prunes the bigram/trigram Zipf tails (pruned grams
    * back off — Brants' frequency cutoff). */
  def trainModel(ref: DataFrame, refTextCol: String,
                 minCount: Long = 1): Model = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val refToks = ref.select(
      explode(TextAnalysis.wordTokens(col(refTextCol))).as("w"))
    val u1 = refToks.groupBy("w").agg(count(lit(1)).as("c1"))
    // N and V land on the driver as plan literals: two scalars from one
    // aggregate — the model's normalization constants, not data
    val nv = u1.agg(sum(col("c1")).as("n"), count(lit(1)).as("v")).collect()(0)
    val bigN = if (nv.isNullAt(0)) 0L else nv.getLong(0)
    val bigV = nv.getLong(1)
    require(bigN > 0, "stupidBackoffScores: reference corpus has no tokens")
    val grams = gramFrame(ref, refTextCol, null)
    val b2 = grams.filter(col("p1").isNotNull)
      .groupBy(col("p1"), col("w")).agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val t3 = grams.filter(col("p2").isNotNull)
      .groupBy(col("p2"), col("p1"), col("w")).agg(count(lit(1)).as("c3"))
      .filter(col("c3") >= minCount)
    Model(u1, b2, t3, bigN, bigV)
  }

  /** Persist a [[Model]]: `u1`/`b2`/`t3` parquet subdirs + a one-row
    * `meta` (n, v). Refresh-in-place lifecycle via a STAGED write:
    * each table first lands in `<path>/<t>__staging`, then swaps into
    * place (delete + rename). The stage matters because the daily flow
    * `loadModel(path) -> incrementModel -> saveModel(path)` holds
    * merged frames that are LAZY scans of the very paths being saved —
    * a direct overwrite is refused by Spark ("Cannot overwrite a path
    * that is also being read from"), and would lose the old counts
    * mid-plan even if it weren't. All four stagings are written before
    * any swap (so every old table is still readable while every new
    * one computes); a crash BETWEEN swaps can leave mixed old/new
    * tables with `__staging` dirs on disk for recovery — single-writer
    * refresh, not a transaction log. */
  def saveModel(model: Model, path: String): Unit = {
    val spark = model.u1.sparkSession
    import spark.implicits._
    val meta = Seq((model.n, model.v)).toDF("n", "v")
    val parts = Seq("u1" -> model.u1, "b2" -> model.b2,
      "t3" -> model.t3, "meta" -> meta)
    parts.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$path/${t}__staging") }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    parts.foreach { case (t, _) =>
      val fin = new org.apache.hadoop.fs.Path(s"$path/$t")
      val stg = new org.apache.hadoop.fs.Path(s"$path/${t}__staging")
      require(!fs.exists(fin) || fs.delete(fin, true),
        s"NgramLm.saveModel: could not replace $fin")
      require(fs.rename(stg, fin),
        s"NgramLm.saveModel: rename $stg -> $fin failed")
    }
  }

  /** Load a saved model. The count frames stay ON DISK as parquet
    * scans (web-scale gram tables never pass through the driver);
    * only the two meta scalars are collected. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1,
      s"NgramLm.loadModel: $path/meta must hold exactly one row, got ${meta.length}")
    val u1 = spark.read.parquet(s"$path/u1")
    val b2 = spark.read.parquet(s"$path/b2")
    val t3 = spark.read.parquet(s"$path/t3")
    require(u1.columns.toSet == Set("w", "c1") &&
      b2.columns.toSet == Set("p1", "w", "c2") &&
      t3.columns.toSet == Set("p2", "p1", "w", "c3"),
      s"NgramLm.loadModel: $path does not hold a backoff-LM artifact")
    Model(u1, b2, t3, meta(0).getAs[Long]("n"), meta(0).getAs[Long]("v"))
  }

  /**
   * Fold a NEW batch's counts into a trained model — the daily-ingest
   * path: counts are sums, so the merge is exactly additive
   * (union + re-aggregate per table; `n` adds, `v` recounts from the
   * merged unigram table — one slim count job). Training on A then
   * incrementing with B is IDENTICAL to training on A ∪ B **when the
   * base model is unpruned** (minCount = 1): a pruned base has already
   * forgotten its sub-threshold tails, so grams crossing the threshold
   * only across batches would undercount — prune at SCORING time (or
   * on a save-side copy), never before a merge.
   */
  def incrementModel(model: Model, newRef: DataFrame,
                     refTextCol: String): Model = {
    val inc = trainModel(newRef, refTextCol, minCount = 1)
    def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
              cnt: String): DataFrame =
      a.unionByName(b).groupBy(keys.map(col): _*)
        .agg(sum(col(cnt)).as(cnt))
    // v needs an eager count anyway, so the merged unigram table (vocab-
    // sized, the small one of the three) is localCheckpoint'd first:
    // the count job, a later saveModel and every scoreWithModel reuse
    // the materialized result instead of re-running the merge per
    // action. b2/t3 stay lazy — they are the web-scale tables.
    val u1 = merge(model.u1, inc.u1, Seq("w"), "c1").lineageCut()
    Model(u1,
      merge(model.b2, inc.b2, Seq("p1", "w"), "c2"),
      merge(model.t3, inc.t3, Seq("p2", "p1", "w"), "c3"),
      n = model.n + inc.n,
      v = u1.count())
  }

  /** Score `docs` under a trained/loaded [[Model]]. */
  def scoreWithModel(docs: DataFrame, textCol: String, idCol: String,
                     model: Model, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0, 1), got $alpha")
    val Model(u1, b2, t3, bigN, bigV) = model

    val g = gramFrame(docs, textCol, idCol)
    val scored = g
      .join(t3, g("p2") <=> t3("p2") && g("p1") <=> t3("p1") &&
        g("w") === t3("w"), "left").drop(t3("p2")).drop(t3("p1")).drop(t3("w"))
      .join(b2.select(col("p1").as("_c2p1"), col("w").as("_c2w"),
          col("c2").as("c2ctx")),
        g("p2") <=> col("_c2p1") && g("p1") === col("_c2w"), "left")
      .drop("_c2p1", "_c2w")
      .join(b2.select(col("p1").as("_bp1"), col("w").as("_bw"),
          col("c2").as("c2pw")),
        g("p1") <=> col("_bp1") && g("w") === col("_bw"), "left")
      .drop("_bp1", "_bw")
      .join(u1.select(col("w").as("_up"), col("c1").as("c1prev")),
        g("p1") <=> col("_up"), "left").drop("_up")
      .join(u1.select(col("w").as("_uw"), col("c1").as("c1w")),
        g("w") === col("_uw"), "left").drop("_uw")
    // the backoff chain as ONE double-valued CASE, ln'd once and
    // rounded to 6 dp — division, multiplication and the alpha factor
    // are exactly-rounded IEEE ops, identical on both engines
    val s1 = (coalesce(col("c1w"), lit(0L)).cast("double") + lit(1.0)) /
      lit((bigN + bigV).toDouble)
    val s2 = when(col("c2pw").isNotNull,
        col("c2pw").cast("double") / col("c1prev").cast("double"))
      .otherwise(lit(alpha) * s1)
    val s3 = when(col("i") === 0, s1)
      .when(col("i") === 1,
        when(col("c2pw").isNotNull,
          col("c2pw").cast("double") / col("c1prev").cast("double"))
        .otherwise(lit(alpha) * s1))
      .otherwise(
        when(col("c3").isNotNull,
          col("c3").cast("double") / col("c2ctx").cast("double"))
        .otherwise(lit(alpha) * s2))
    val perDoc = scored
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(round(log(s3), 6).cast("decimal(28,6)")).as("_ls"))
    docs.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("_ls").cast("double"), lit(0.0)).as("logscore"))
  }

  /** Positional grams of every doc: one row per token position with
    * `(i 0-based, w, p1 = previous token or NULL, p2 = token before
    * that or NULL)` — an index-aware `transform` over the token array,
    * exploded once; no window, no per-doc sort, no self-join.
    *
    * The token array is MATERIALIZED in its own projection first: the
    * lambda references it three times (input + two `element_at`s), and
    * inlining the split/filter chain into each reference re-tokenizes
    * the document per gram — O(len²) per doc, measured 7.5 s of an
    * 11 s sf0.1 scoring pass before this split. CollapseProject keeps
    * the boundary (the alias is non-cheap and multiply-referenced). */
  private def gramFrame(df: DataFrame, textCol: String,
                        idCol: String): DataFrame = {
    val idCols = Option(idCol).map(col).toSeq
    val base = df.select(
      idCols :+ TextAnalysis.wordTokens(col(textCol)).as("_t"): _*)
    val t = col("_t")
    val gram = transform(t, (w, i) => struct(
      i.cast("int").as("i"),
      w.as("w"),
      when(i >= 1, element_at(t, i)).as("p1"),
      when(i >= 2, element_at(t, i - 1)).as("p2")))
    base.select(idCols :+ explode(gram).as("g"): _*)
      .select(idCols :+ col("g.*"): _*)
  }
}
