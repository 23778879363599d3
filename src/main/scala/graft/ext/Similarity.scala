package graft.ext

import graft.core.Checkpoints.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


import TextFunctions._

/**
 * Similarity search over an embedding column (`ArrayType(FloatType)`).
 *
 * Scale design:
 *   - brute-force top-k: broadcast the (small) query set against the
 *     (huge) corpus — one narrow pass over the corpus, per-partition
 *     partial top-k via window rank AFTER a corpus-partition-local
 *     aggregation; no corpus shuffle of vectors.
 *   - LSH (random hyperplane) ANN: bucket corpus + queries by signature,
 *     join on bucket (plus neighbor probing via reduced-bit signatures),
 *     rank within candidates — the 100 TB path where brute force is
 *     impossible. Recall controlled by nbits/probes.
 */
object Similarity {

  /**
   * Exact brute-force cosine top-k per query vector: queries broadcast,
   * corpus scanned once, and the per-query top-k kept by the bounded
   * [[TopKByScore]] aggregate — map-side partial heaps mean the shuffle
   * carries k pairs per query instead of |corpus|×|queries| scored rows
   * (the Window/row_number formulation's full sort is gone).
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /**
   * Semantic benchmark decontamination — the embedding-space complement
   * of the exact n-gram [[TextAnalysis.contaminated]] check (the
   * "decontaminate against eval sets by embedding similarity" step of
   * modern data pipelines): every corpus row comes back annotated with
   * its max cosine to ANY benchmark vector (`max_bench_cosine`, exact)
   * and `contaminated = max_bench_cosine >= threshold`; the pipeline
   * keeps `!contaminated`. Paraphrased or reformatted benchmark leakage
   * that shares no 8-gram still lands near the benchmark embedding —
   * that's what this catches and the n-gram check can't.
   *
   * Scale: benchmark sets are small (thousands of rows) — the benchmark
   * side broadcasts and the corpus streams through one codegen'd
   * scoring pass + a per-row max: no corpus shuffle of any kind, the
   * same justified broadcast-crossJoin shape as [[bruteForceTopK]].
   * Corpus rows: one output row per input row, O(|bench|·d) work each.
   * For benchmark sets too big to broadcast, bucket both sides with
   * [[lshTopK]]'s hyperplane signatures instead. An EMPTY benchmark
   * frame produces an EMPTY result (no rows scored, not "all clean") —
   * a keep-side join against it drops the whole corpus, so guard the
   * call site if the benchmark can legitimately be empty. A corpus row
   * with a NULL embedding comes back with max_bench_cosine = NULL and
   * contaminated = false: unscorable is not evidence of contamination,
   * and a NULL flag would make the keep-filter drop the row silently.
   */
  def semanticDecontaminate(corpus: DataFrame, vecCol: String, idCol: String,
                            bench: DataFrame, benchVecCol: String,
                            threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val b = broadcast(bench.select(col(benchVecCol).as("_bv")))
    corpus.select(col(idCol), col(vecCol).as("_cv"))
      .crossJoin(b)
      .groupBy(col(idCol))
      .agg(max(cosine_sim(col("_cv"), col("_bv"))).as("max_bench_cosine"))
      // a NULL-embedding corpus row scores NULL against every bench
      // vector; leave its max NULL (visibly unscorable) but pin the
      // flag to false — NULL >= t is NULL, and the documented
      // `keep !contaminated` filter would otherwise drop the row
      // silently instead of annotating it
      .withColumn("contaminated",
        coalesce(col("max_bench_cosine") >= threshold, lit(false)))
  }

  /**
   * EXACT all-pairs cosine pairs above a threshold — the O(n²) oracle
   * anchor the probabilistic twins (hyperplane-LSH, IVF) gate their
   * recall against. GUARDED: an all-pairs crossJoin is a diagnostic for
   * bounded corpora, never a production path — at scale the answer is
   * [[Dedup.embeddingPairs]]/[[similarPairs]]/[[lshTopK]]. The early-terminating
   * pre-count refuses anything above `maxRows` with a clear error;
   * raising the cap is a deliberate caller decision.
   */
  def exactCosinePairs(df: DataFrame, vecCol: String, idCol: String,
                       threshold: Double, maxRows: Long = 100000L): DataFrame = {
    // clamp before the +1: a maxRows at/above Int.MaxValue would overflow
    // limit()'s Int argument (negative limit = AnalysisException, or a
    // silently truncated pre-count that defeats the guard)
    val cap = math.min(math.max(maxRows, 0L), Int.MaxValue - 1L).toInt
    val bounded = df.limit(cap + 1).count()
    require(bounded <= cap,
      s"exactCosinePairs is an O(n²) exact diagnostic and the input exceeds " +
        s"maxRows=$maxRows. Use the LSH/IVF approximate paths at scale, or " +
        "raise maxRows deliberately for a bounded oracle run.")
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val r = e.select(col("id").as("id2"), col("v").as("v2"))
    e.crossJoin(r).filter(col("id") < col("id2"))
      .filter(cosine_sim(col("v"), col("v2")) >= threshold)
      .select("id", "id2")
  }

  /**
   * Cluster-local near-duplicate pairs — the SemDeDup recipe (Abbas et
   * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
   * semantic deduplication", a public paper): coarse k-means clustering
   * first, then exact cosine pairs ONLY within each cluster. The global
   * O(n²) becomes Σ O(|cell|²) over co-partitioned cells — the shuffle
   * carries each vector once, keyed by its cell, and every pair
   * computation is cell-local. Complementary to [[Dedup.embeddingPairs]]
   * (hyperplane-LSH buckets): k-means cells follow the data's density
   * (semantic neighborhoods), LSH buckets are data-oblivious.
   *
   * Skew/size honesty at 100 TB — the NO-SILENT-CAPS contract (same
   * bar as `Dedup.setSimilarityOverflow`): a cell above `maxCell` would
   * go quadratic, so oversized cells are excluded from pair search —
   * and that exclusion is NEVER silent on the path users call. The
   * operator counts oversized cells inline (one bounded-cardinality
   * aggregation — ≤ `cells` rows collected) and THROWS by default,
   * naming the cell count, the largest cell, and the two escape routes
   * (more `cells`, or `allowOversizedCells = true` which logs the
   * exclusion and proceeds — [[clusterOversizedCells]] then itemizes
   * what was skipped). `cells = 0` (the default) derives the cell count
   * from the corpus: k ≈ √n — the standard IVF heuristic, and the
   * many-small-cells regime SemDeDup actually runs (the paper uses tens
   * of thousands of cells over web-scale corpora), giving expected cell
   * size √n ≪ `maxCell`. Train cost stays constant (bounded sample +
   * driver Lloyd — [[Ivf.train]]).
   *
   * EAGER contract, job-trimmed: `cells = 0` resolves k and draws the
   * training sample in ONE pass ([[Ivf.samplePass]] — a count job plus a
   * sample job would scan the corpus twice for the same information);
   * the cell-size aggregate rides INSIDE the pair job as its broadcast
   * side (under-cap cells only enter the self-join, so oversized cells
   * never cost quadratic work), and the loud-cap check then reads the
   * (column-pruned, cached) `assigned` frame after the single pair
   * action. The check still throws at CALL time — the function can
   * never RETURN a silently incomplete pair set — it just no longer
   * spends a dedicated Spark job to do so.
   */
  def clusterCosinePairs(df: DataFrame, vecCol: String, idCol: String,
                         threshold: Double, cells: Int = 0,
                         maxIter: Int = 5, maxCell: Int = 10000,
                         seed: Long = 42L,
                         allowOversizedCells: Boolean = false): DataFrame = {
    TextFunctions.registerAll(df.sparkSession)
    val slim = df.select(col(idCol), col(vecCol))
    val model = trainDerived(slim, vecCol, idCol, cells, maxIter, seed)
    // ONE assignment pass: the per-row argmin over k centroids is the
    // dominant per-vector cost, so the frame is transient-persisted for
    // its uses (cell-size side + both self-join branches + cap check)
    // and released after the eager pair materialization below
    val assigned = Ivf.assign(slim, vecCol, model)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("ivf_cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cellSizes = assigned.groupBy("ivf_cell").agg(count(lit(1)).as("_n"))
      // in-plan cap: ≤ model.k under-cap cells broadcast onto the join —
      // no driver round-trip before the pair action, and oversized cells
      // are excluded BEFORE any quadratic work happens
      val okCells = cellSizes.filter(col("_n") <= maxCell).select("ivf_cell")
      val capped = assigned.join(broadcast(okCells), Seq("ivf_cell"))
      // eager materialization of the (small, threshold-filtered) pair
      // set bounds the persist's lifetime (the minhashPairs discipline)
      val pairs = capped
        .join(capped.select(col("ivf_cell"), col("id").as("id2"),
          col("v").as("v2")), Seq("ivf_cell"))
        .filter(col("id") < col("id2"))
        .select(col("id"), col("id2"),
          cosine_sim(col("v"), col("v2")).as("cosine"))
        .filter(col("cosine") >= threshold)
        .lineageCut(true)
      // loud-cap check AFTER the single pair action: a bounded collect
      // (≤ model.k rows) over the cached assignment — the cache scan
      // prunes to the ivf_cell column, so this is metadata-cheap
      val oversized = cellSizes.filter(col("_n") > maxCell)
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      if (oversized.nonEmpty) {
        val excluded = oversized.map(_._2).sum
        val msg = s"semantic dedup cell cap exceeded: ${oversized.length} of " +
          s"${model.k} cells hold more than maxCell=$maxCell vectors (largest " +
          s"${oversized.map(_._2).max}, $excluded vectors total) and would be " +
          "silently excluded from pair search. Retrain with more cells " +
          "(cells = 0 derives k ~ sqrt(n)), raise maxCell deliberately, or pass " +
          "allowOversizedCells = true to proceed minus those cells " +
          "(clusterOversizedCells itemizes them)."
        if (!allowOversizedCells) throw new IllegalStateException(msg)
        org.apache.log4j.Logger.getLogger(getClass).warn(msg)
      }
      pairs
    } finally assigned.unpersist(false)
  }

  /** The shared `cells = 0` training path: one [[Ivf.samplePass]] pass
    * resolves k ≈ √n and draws the sample together; `cells > 0` keeps
    * the plain [[Ivf.train]] route (footer-first count fallback). Every
    * derived-cells operator MUST go through this so the pairs operator
    * and its overflow-report twin see the same model. */
  private def trainDerived(slim: DataFrame, vecCol: String, idCol: String,
                           cells: Int, maxIter: Int, seed: Long): Ivf.Model = {
    require(cells >= 0, "cells must be >= 0 (0 = derive from corpus size)")
    if (cells > 0)
      Ivf.train(slim, vecCol, k = cells, maxIter = maxIter, seed = seed)
    else {
      val (sample, n) = Ivf.samplePass(slim, vecCol, idCol)
      Ivf.trainFromSample(sample, resolveCells(n, cells), maxIter, seed)
    }
  }

  /** `cells = 0` → k ≈ √n clamped to [4, 16384] (the IVF heuristic:
    * expected cell size √n, so the `maxCell` quadratic guard binds only
    * under genuine density skew). The upper clamp keeps driver Lloyd
    * honest: train is O(sampleCap · k · d · iters) — parallel across
    * driver cores, but linear in k, so "bounded-sample constant" holds
    * only with k bounded too; past the clamp the sample (100k default)
    * would also be too thin to fit meaningfully more centroids. */
  private def resolveCells(n: Long, cells: Int): Int = {
    require(cells >= 0, "cells must be >= 0 (0 = derive from corpus size)")
    if (cells > 0) cells
    else math.max(4, math.min(16384,
      math.ceil(math.sqrt(n.toDouble)).toInt))
  }

  /**
   * Overflow report for [[clusterCosinePairs]]'s cell cap — the "no
   * silent caps" twin (same contract as `Dedup.setSimilarityOverflow`):
   * one row per cell excluded for exceeding `maxCell`, with its size.
   * Every vector in a reported cell was excluded from pair search;
   * route those cells through the LSH path ([[Dedup.embeddingPairs]])
   * or retrain with more cells.
   */
  def clusterOversizedCells(df: DataFrame, vecCol: String, idCol: String,
                            cells: Int = 0, maxIter: Int = 5,
                            maxCell: Int = 10000,
                            seed: Long = 42L): DataFrame = {
    val model = trainDerived(df.select(col(idCol), col(vecCol)), vecCol,
      idCol, cells, maxIter, seed)
    Ivf.assign(df, vecCol, model)
      .groupBy("ivf_cell").agg(count(lit(1)).as("cell_size"))
      .filter(col("cell_size") > maxCell)
  }

  /**
   * SemDeDup keepers: transitive closure over the cluster-local pair set
   * ([[Dedup.components]] — pointer doubling, no driver state), keep the
   * minimum id per duplicate group, anti-join the rest out. Inherits
   * [[clusterCosinePairs]]'s loud-cap contract: an oversized cell throws
   * by default — "dedup ran, nothing to remove" can never mean "every
   * cell was over the cap and pair search was skipped".
   */
  def semanticDedupKeepers(df: DataFrame, vecCol: String, idCol: String,
                           threshold: Double, cells: Int = 0,
                           maxIter: Int = 5, maxCell: Int = 10000,
                           seed: Long = 42L,
                           allowOversizedCells: Boolean = false): DataFrame = {
    val pairs = clusterCosinePairs(df, vecCol, idCol, threshold, cells,
      maxIter, maxCell, seed, allowOversizedCells)
    val dupes = Dedup.components(pairs)
      .filter(col("node") =!= col("rep"))
      .select(col("node").as("_dup"))
    df.join(dupes, df(idCol) === col("_dup"), "left_anti")
  }

  /**
   * Incremental (cross-batch) semantic near-dup pairs — the embedding
   * twin of [[Dedup.crossPairsViaMinhash]], completing the
   * incremental-ingestion story across both similarity families: a NEW
   * batch is assigned into the EXISTING corpus's cell layout
   * (`oldAssigned` rows carrying (`idCol`, `vecCol`, `ivf_cell`) plus
   * the `model` that produced them — exactly the persisted IVF artifact
   * `GeoDb.createVectorIndex` / [[Ivf.writePartitioned]] keeps between
   * batches), and exact cosine pairs are computed NEW × OLD within each
   * cell ONLY — never a self-join. An identical re-ingested vector
   * lands in its original's cell by construction (same centroids,
   * deterministic argmin), so exact-copy recall is 1.0 whatever the
   * cell count.
   *
   * Scale: per-batch cost = |delta| assignment work + Σ |new ∩ cell| ×
   * |old ∩ cell| over cells the delta TOUCHES — untouched cells are
   * filtered out before the join, and when `oldAssigned` is a scan of
   * an `ivf_cell`-partitioned layout that filter is a STATIC partition
   * filter (unprobed cell directories are never listed). Inherits the
   * [[clusterCosinePairs]] loud-cap contract on the OLD side: a touched
   * cell holding more than `maxCell` existing vectors throws by default
   * (`allowOversizedCells = true` logs and proceeds minus those cells).
   * The delta side is batch-sized by definition and is not capped.
   * Output: (id = new-batch id, id2 = existing id, cosine).
   */
  def crossClusterCosinePairs(newDf: DataFrame, vecCol: String, idCol: String,
                              oldAssigned: DataFrame, model: Ivf.Model,
                              threshold: Double, maxCell: Int = 10000,
                              allowOversizedCells: Boolean = false): DataFrame = {
    TextFunctions.registerAll(newDf.sparkSession)
    // the delta's assignment recomputes across its uses DELIBERATELY: it
    // is batch-sized by the operator's premise, so a narrow re-map is
    // cheaper than cache management, and the lazy return keeps the plan
    // composable and inspectable (the engine spec asserts partition
    // pruning + broadcast on it) — unlike the corpus-sized self-join in
    // clusterCosinePairs, which does persist
    val newAssigned = Ivf.assign(newDf.select(col(idCol), col(vecCol)),
        vecCol, model)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("ivf_cell"))
    // bounded collect: ≤ model.k distinct touched cells
    val touched = newAssigned.select("ivf_cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val old = oldAssigned
      .select(col(idCol).as("id2"), col(vecCol).as("v2"), col("ivf_cell"))
      .filter(col("ivf_cell").isInCollection(touched))
    // loud cap on the OLD side of touched cells (≤ |touched| rows). The
    // old side is scanned twice (cap check + pair join) — both scans are
    // partition-pruned to touched cells, the price of failing loudly
    // before the join instead of inside it
    val oversized = old.groupBy("ivf_cell")
      .agg(count(lit(1)).as("_n")).filter(col("_n") > maxCell)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    if (oversized.nonEmpty) {
      val msg = s"incremental semantic dedup cell cap exceeded: " +
        s"${oversized.length} of ${touched.size} touched cells hold more " +
        s"than maxCell=$maxCell existing vectors (largest " +
        s"${oversized.map(_._2).max}). Rebuild the corpus index with more " +
        "cells, raise maxCell deliberately, or pass allowOversizedCells = " +
        "true to proceed minus those cells."
      if (!allowOversizedCells) throw new IllegalStateException(msg)
      org.apache.log4j.Logger.getLogger(getClass).warn(msg)
    }
    val oversizedIds = oversized.map(_._1).toSet
    val oldCapped =
      if (oversizedIds.isEmpty) old
      else old.filter(!col("ivf_cell").isInCollection(oversizedIds))
    val newCapped =
      if (oversizedIds.isEmpty) newAssigned
      else newAssigned.filter(!col("ivf_cell").isInCollection(oversizedIds))
    // BROADCAST the delta (batch-sized by the operator's premise, like
    // Ivf.search's query side): ivf_cell has at most model.k distinct
    // values, so a shuffle join on it would repartition the huge OLD
    // side by a low-cardinality, density-skewed key — the one shuffle
    // this operator must never do
    oldCapped.join(broadcast(newCapped), Seq("ivf_cell"))
      .select(col("id"), col("id2"),
        cosine_sim(col("v"), col("v2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /**
   * DataFrame-level convenience over [[crossClusterCosinePairs]]: train
   * the quantizer on the EXISTING corpus (cells = 0 → k ≈ √|old|),
   * assign it, and cross-pair the new batch against it. In a real
   * ingestion pipeline the train+assign happens ONCE
   * (`GeoDb.createVectorIndex` persists it); this form is for ad-hoc
   * two-frame runs where no artifact exists yet.
   */
  def incrementalSemanticPairs(newDf: DataFrame, oldDf: DataFrame,
                               vecCol: String, idCol: String,
                               threshold: Double, cells: Int = 0,
                               maxIter: Int = 5, maxCell: Int = 10000,
                               seed: Long = 42L,
                               allowOversizedCells: Boolean = false): DataFrame = {
    val oldSlim = oldDf.select(col(idCol), col(vecCol))
    val model = trainDerived(oldSlim, vecCol, idCol, cells, maxIter, seed)
    crossClusterCosinePairs(newDf, vecCol, idCol,
      Ivf.assign(oldSlim, vecCol, model), model,
      threshold, maxCell, allowOversizedCells)
  }

  /** New-batch rows that semantically duplicate NO existing-corpus
    * vector — the keeper side of [[incrementalSemanticPairs]] (the
    * embedding twin of [[Dedup.incrementalKeepers]]). */
  def incrementalSemanticKeepers(newDf: DataFrame, oldDf: DataFrame,
                                 vecCol: String, idCol: String,
                                 threshold: Double, cells: Int = 0,
                                 maxIter: Int = 5, maxCell: Int = 10000,
                                 seed: Long = 42L,
                                 allowOversizedCells: Boolean = false): DataFrame = {
    val dupes = incrementalSemanticPairs(newDf, oldDf, vecCol, idCol,
        threshold, cells, maxIter, maxCell, seed, allowOversizedCells)
      .select(col("id").as("_dup")).distinct()
    newDf.join(dupes, newDf(idCol) === col("_dup"), "left_anti")
  }

  /** groupBy + bounded-heap aggregate -> (query_id, corpus_id, cosine, rank). */
  private[ext] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(TopKAggregate.topk_by_score(col("corpus_id"), col("cosine"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("corpus_id"),
        col("col.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))

  /**
   * Graded ranking-quality metrics — nDCG@k and MRR@k per query, the
   * evaluation step of a retrieval stack (complements the recall@k
   * harness): `results` carries retrieved (query_id, corpus_id, rank),
   * `grades` the labeled relevance pool (query_id, corpus_id, grade in
   * [0, 62] — refused loudly outside, since 2^grade rides an exact
   * long shift; unlabeled pairs count as grade 0). Gains are the standard
   * `(2^grade − 1) / log2(pos + 1)`; 2^grade rides an exact integer
   * shift, each per-position term is `round(…, 6)` (the repo-wide pin
   * that keeps both engines' `ln` ulp classes comparable) and sums
   * accumulate as DECIMAL — order-free and exactly replayable. IDCG@k
   * ranks the query's labeled pool by grade through the bounded-heap
   * aggregate (never a corpus sort); a query with an empty/zero pool
   * reports ndcg 0.0 (not NULL — a dashboard mean over NULLs silently
   * shrinks its denominator), and mrr 0.0 when nothing relevant was
   * retrieved.
   *
   * Scale: two slim-key joins (results × grades on (query, corpus);
   * results are |queries|·k rows) + one bounded-heap pass over the
   * grade pool — nothing rescans a corpus.
   */
  def rankingMetrics(results: DataFrame, grades: DataFrame,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Seq("query_id", "corpus_id", "rank").foreach(c =>
      require(results.columns.contains(c), s"results needs column '$c'"))
    Seq("query_id", "corpus_id", "grade").foreach(c =>
      require(grades.columns.contains(c), s"grades needs column '$c'"))
    def gainTerm(grade: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round((call_function("shiftleft", lit(1L), grade.cast("int"))
        .cast("double") - 1.0) /
        (log(pos.cast("double") + 1.0) / log(lit(2.0))), 6)
        .cast("decimal(28,6)")
    // 2^grade is a LONG shift: Java shifts are mod 64, so grade 64
    // would silently score as gain 0 and grade 63 as negative; a
    // negative grade shifts by its low 6 bits. Out-of-range grades are
    // REFUSED loudly per row (NULL passes through — it coalesces to 0
    // on the results side and is dropped from the ideal pool).
    def checkedGrade(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c.isNull || (c >= 0 && c <= 62), c)
        .otherwise(raise_error(concat(
          lit("rankingMetrics: grade must be in [0, 62] — 2^grade rides " +
            "an exact long shift (mod-64 wrap past 62, undefined for " +
            "negatives), got "), c.cast("string"))).cast("long"))
    val gradesChecked = grades.select(col("query_id"), col("corpus_id"),
      checkedGrade(col("grade").cast("long")).as("grade"))
    val g = results.filter(col("rank") <= k)
      .join(gradesChecked, Seq("query_id", "corpus_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0L)))
    val dcg = g.groupBy("query_id").agg(
      sum(gainTerm(col("grade"), col("rank"))).as("_dcg"),
      max(when(col("grade") > 0, round(lit(1.0) / col("rank"), 6)))
        .as("_mrr"))
    val ideal = gradesChecked.filter(col("grade") > 0)
      .groupBy("query_id")
      .agg(TopKAggregate.topk_by_score(col("corpus_id"),
        col("grade").cast("double"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.score").cast("long").as("grade"),
        (col("pos") + 1).as("pos"))
      .groupBy("query_id")
      .agg(sum(gainTerm(col("grade"), col("pos"))).as("_idcg"))
    dcg.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        when(col("_idcg").isNull || col("_idcg") <= 0, lit(0.0))
          .otherwise(round(col("_dcg").cast("double") /
            col("_idcg").cast("double"), 6)).as("ndcg"),
        coalesce(col("_mrr"), lit(0.0)).as("mrr"))
  }

  /**
   * Matryoshka two-stage retrieval (MRL, Kusupati et al. 2022): score
   * by cosine over the FIRST `prefixDim` dimensions — for MRL-trained
   * embeddings every prefix is itself a valid embedding — shortlist
   * `shortlist` candidates per query, then exactly re-rank the
   * shortlist at full dimension and keep top `k`. The standard
   * cheap-first funnel modern embedding APIs ship: the prefix pass
   * reads `prefixDim/d` of the vector bytes per candidate.
   *
   * Scale: stage 1 is the [[bruteForceTopK]] broadcast-crossJoin shape
   * (bounded per-query heaps, no corpus shuffle) at `prefixDim/d` of
   * the arithmetic; stage 2 re-reads full vectors for only
   * |queries|·shortlist rows via a slim-key join. With a columnar
   * layout that stores the prefix as its own column (or a PQ/IVF index
   * over prefixes — compose with [[Ivf]]), stage 1's scan shrinks by
   * the same fraction. Vectors shorter than `prefixDim` are refused
   * loudly per row, never silently truncated.
   */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String, k: Int,
                     prefixDim: Int, shortlist: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    require(k >= 1, s"k must be >= 1, got $k")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    // the guard rides the slice LENGTH argument, so it stays generic
    // over the vector's element type (float or double arrays)
    def pfx(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = slice(v, lit(1),
      when(size(v) < prefixDim,
        raise_error(concat(lit("matryoshkaTopK: vector of dim "),
          size(v).cast("string"),
          lit(s" is shorter than prefixDim=$prefixDim"))).cast("int"))
        .otherwise(lit(prefixDim)))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val pre = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(pfx(col("qv")), pfx(col("cv"))).as("cosine"))
    val short = rankTopK(pre, shortlist).select("query_id", "corpus_id")
    val rer = short
      .join(c, Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("qv"), col("cv")).as("cosine"))
    rankTopK(rer, k)
  }

  /**
   * Approximate NN via hyperplane-LSH buckets: candidates share the
   * high-`nbits` signature on at least one of the `probes` rotations.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, k: Int = 10,
              nbits: Int = 12, probes: Int = 4, seed: Long = 42L): DataFrame = {
    def sig(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(id), col(v),
          posexplode(transform(sequence(lit(0), lit(probes - 1)),
            p => hyperplane_sig(col(v), lit(nbits), p.cast("long") * 1000 + seed))))
        .withColumnRenamed("pos", "probe").withColumnRenamed("col", "bucket")
    val c = sig(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")),
      "corpus_id", "cv")
    val q = sig(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv")
    val cands = c.join(broadcast(q), Seq("probe", "bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine_sim(col("qv"), col("cv")).as("cosine"))
      .distinct()
    rankTopK(cands, k)
  }

  /** All pairs above a cosine threshold (via multi-band LSH buckets). */
  def similarPairs(df: DataFrame, vecCol: String, idCol: String,
                   threshold: Double = 0.9, nbits: Int = 8,
                   bands: Int = 8, seed: Long = 42L): DataFrame =
    Dedup.embeddingPairs(df, vecCol, idCol, threshold, nbits, bands, seed)

  /**
   * Symmetric per-vector int8 quantization (the FAISS/pgvector storage
   * trick): scale = max|x| / 127, q_i = round-half-up(x_i / scale) —
   * 4x smaller than float32 on disk and over the shuffle, max
   * reconstruction error scale/2 per component. Pure built-in
   * higher-order functions (aggregate/transform), all double math so the
   * result is bit-deterministic across engines. Adds `q_scale` (double)
   * and `q_vec` (array<tinyint>); zero vectors quantize to all-zero with
   * scale 0.
   */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val maxAbs = aggregate(col(vecCol), lit(0.0),
      (a, x) => greatest(a, abs(x.cast("double"))))
    df.withColumn("q_scale", maxAbs / 127.0)
      .withColumn("q_vec",
        when(col("q_scale") === 0.0,
          transform(col(vecCol), _ => lit(0).cast("tinyint")))
        .otherwise(transform(col(vecCol),
          x => floor(x.cast("double") / col("q_scale") + 0.5).cast("tinyint"))))
  }

  /** Inverse of [[quantizeInt8]]: reconstruct doubles (error <= scale/2). */
  def dequantizeInt8(qVec: org.apache.spark.sql.Column,
                     scale: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(qVec, q => q.cast("double") * scale)

  /** A trained product-quantization codebook: `centroids(s)(j)` is the
    * `dsub`-dim double centroid j of subspace s. m·k·dsub doubles —
    * driver-resident, shipped to executors via addReferenceObj. */
  case class PqModel(m: Int, k: Int, dsub: Int,
                     centroids: Array[Array[Array[Double]]])

  // Squared-L2 argmin codes are computed by the codegen'd PqKernel
  // expressions (PqExpressions.scala): the codebook ships via
  // ctx.addReferenceObj — constant generated-code size in k, replacing
  // the earlier literal when-chain/struct-argmin trees whose size was
  // m·k·dsub terms (a JVM 64 KB method ceiling at production k=256).
  // Distance order (left-associated (x_i-c_i)² double sums) and
  // tie-to-smaller-j are preserved bit-for-bit — see PqKernel scaladoc.

  /**
   * Product-quantization codebook TRAINING (Jégou, Douze & Schmid,
   * TPAMI 2011 — the faiss workhorse): split d dims into `m` subspaces
   * and run `iters` Lloyd iterations of k-means per subspace over the
   * WHOLE corpus, distributed. Deterministic and ORACLE-REPLAYABLE by
   * construction (the [[graft.ext.TextAnalysis.trainQualityClassifier]]
   * recipe applied to k-means): init = the first `k` vectors by id
   * (not a seeded sample), per-coordinate centroid updates accumulate
   * in DECIMAL(38,18) (exact, order-independent) before the double
   * division by the cluster count, assignment distances are explicit
   * left-associated term sums with ties to the smaller centroid index,
   * and a cluster that loses all members keeps its previous centroid.
   *
   * Scale: each iteration is ONE map-side-combined aggregate over the
   * slim (s, sub-vector) frame — m·k groups of dsub decimal sums; the
   * corpus never shuffles vectors. The codebook (m·k·dsub doubles)
   * lives on the driver and ships to executors as a kernel
   * reference object (constant generated-code size in k).
   */
  def pqTrain(df: DataFrame, vecCol: String, idCol: String,
              m: Int = 4, k: Int = 16, iters: Int = 2): PqModel = {
    require(m >= 1 && k >= 2 && iters >= 1, "need m >= 1, k >= 2, iters >= 1")
    val d = df.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"vector dim $d not divisible by m = $m")
    val dsub = d / m
    val init = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
    require(init.length == k, s"need at least $k vectors to seed, got ${init.length}")
    // element read is numeric-type-agnostic: pqCode/pqEncode accept any
    // numeric array element via the Catalyst double cast, so the seed
    // read must too (array<double> corpora crashed a getSeq[Float])
    val centroids: Array[Array[Array[Double]]] = Array.tabulate(m, k, dsub) {
      (s, j, i) => init(j).getSeq[Any](0)(s * dsub + i) match {
        case n: java.lang.Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"non-numeric vector element: $other")
      }
    }
    var model = PqModel(m, k, dsub, centroids)
    // slim (s, sub) frame computed once; every iteration re-scans it
    val subs = df.select(posexplode(array((0 until m).map(s =>
        slice(col(vecCol), s * dsub + 1, dsub)): _*)).as(Seq("s", "sub")))
      .lineageCut()
    for (_ <- 1 to iters) {
      // ONE scan per iteration (the scaladoc's claim): the codegen'd
      // pq_assign kernel dispatches on the subspace id column — a
      // per-subspace filter+union would scan the frame m times
      val assigned = subs.withColumn("a",
        PqFunctions.pq_assign(col("s"), col("sub"), model.centroids))
      val aggs = count(lit(1)).as("_n") +: (0 until dsub).map(i =>
        sum(element_at(col("sub"), i + 1).cast("double")
          .cast("decimal(38,18)")).as(s"_c$i"))
      val rows = assigned.groupBy("s", "a").agg(aggs.head, aggs.tail: _*)
        .collect()
      val next = Array.tabulate(m, k, dsub)((s, j, i) => model.centroids(s)(j)(i))
      rows.foreach { r =>
        val s = r.getAs[Int]("s"); val j = r.getAs[Int]("a")
        val n = r.getAs[Long]("_n")
        (0 until dsub).foreach { i =>
          next(s)(j)(i) =
            r.getAs[java.math.BigDecimal](s"_c$i").doubleValue() / n
        }
      }
      model = PqModel(m, k, dsub, next)
    }
    model
  }

  /** Encode every vector with a trained [[PqModel]]: (id, code) where
    * code is the length-m int array of per-subspace centroid indices —
    * d·4 bytes compressed to m bytes-ish, the PQ storage win. One
    * narrow codegen projection, no shuffle. */
  def pqEncode(df: DataFrame, vecCol: String, idCol: String,
               model: PqModel): DataFrame =
    df.select(col(idCol),
      PqFunctions.pq_encode(col(vecCol), model.centroids).as("code"))

  /** Asymmetric-distance (ADC) top-k: squared-L2 between the RAW query
    * vector and each corpus vector's PQ RECONSTRUCTION, summed from the
    * per-subspace distance of the query slice to the CODED centroid —
    * the standard PQ search. Exact w.r.t. the codes (the quantization
    * error is the only approximation); ties break on id. Scale: codes
    * are m small ints per row, the distance table ships as a reference object, and the
    * bounded TakeOrdered head keeps k rows — no vector ever shuffles. */
  def pqSearchAdc(codes: DataFrame, idCol: String, model: PqModel,
                  query: Array[Float], k: Int): DataFrame =
    pqSearchAdc(codes, idCol, model, query.map(_.toDouble), k)

  /** Double-query variant — the primary: pqTrain/pqEncode are
    * numeric-type-agnostic (any numeric array upcasts to double), so a
    * double-vector corpus must not be forced to downcast its query to
    * float against the double-trained codebook. Floats upcast losslessly
    * via the overload above. */
  /** The per-subspace ADC distance TABLE of one query, precomputed on
    * the driver in the same left-associated term order the runtime
    * kernels use — bit-identical values, m·k doubles. */
  private[ext] def adcTable(model: PqModel, query: Array[Double]): Array[Array[Double]] = {
    require(query.length == model.m * model.dsub, "query dim mismatch")
    Array.tabulate(model.m, model.k) { (s, j) =>
      var d = 0.0
      var i = 0
      while (i < model.dsub) {
        val x = query(s * model.dsub + i) - model.centroids(s)(j)(i)
        d += x * x
        i += 1
      }
      d
    }
  }

  def pqSearchAdc(codes: DataFrame, idCol: String, model: PqModel,
                  query: Array[Double], k: Int): DataFrame =
    codes.select(col(idCol),
        PqFunctions.pq_adc(col("code"), adcTable(model, query)).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc).limit(k)

  /**
   * Two-stage retrieval REFINEMENT (the faiss `refine`/ScaNN reorder
   * standard): ADC selects a cheap candidate top-`rerank` from the
   * codes, then ONLY those candidates' raw vectors are fetched and
   * re-scored with exact squared L2 — correcting PQ quantization error
   * at the cost of reading `rerank` raw vectors instead of zero.
   * `rerank` a few × k recovers near-exact recall while the corpus
   * itself is still scanned only as m-int codes. The exact distance is
   * the explicit left-associated per-dim sum (zip_with + sequential
   * aggregate fold — cross-engine replayable like the ADC tables);
   * ties break (dist asc, id asc).
   */
  def pqSearchAdcRefine(codes: DataFrame, vectors: DataFrame,
                        vecCol: String, idCol: String, model: PqModel,
                        query: Array[Double], k: Int, rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1, got k=$k rerank=$rerank")
    val cands = pqSearchAdc(codes, idCol, model, query, rerank)
      .select(col(idCol))
    exactRerankOn(vectors, vecCol, idCol, cands, query, k)
  }

  /** Exact squared-L2 re-rank of `cands` against the raw vectors — the
    * left-associated zip_with fold both refine paths share; ties
    * (dist asc, id asc). */
  private[ext] def exactRerankOn(vectors: DataFrame, vecCol: String, idCol: String,
                          cands: DataFrame, query: Array[Double],
                          k: Int): DataFrame = {
    val qArr = array(query.map(lit(_)): _*)
    val dist = aggregate(
      zip_with(col(vecCol), qArr, (x, q) => {
        val dd = x.cast("double") - q; dd * dd
      }), lit(0.0), (acc, v) => acc + v)
    vectors.join(broadcast(cands), Seq(idCol), "left_semi")
      .select(col(idCol), dist.as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc).limit(k)
  }

  // ---- OPQ: parametric optimized product quantization ---------------------

  /** An OPQ model: the full-rank PCA rotation + the eigenvalue-balanced
    * subspace permutation + the PQ codebook trained in rotated space.
    * `perm(p)` = the principal-component index placed at rotated
    * coordinate p (subspace p / dsub, slot p % dsub). */
  case class OpqModel(pca: Pca.PcaModel, perm: Array[Int], pq: PqModel)

  /** Eigenvalue-BALANCED allocation (OPQ-parametric's): directions in
    * eigen-descending order each land on the open subspace with the
    * smallest current log-eigenvalue product (ties to the lower
    * subspace index) — equalizing per-subspace information under the
    * Gaussian-independence assumption. Deterministic. */
  private[graft] def opqAllocate(eig: Array[Double], m: Int): Array[Int] = {
    require(eig.length % m == 0, s"dim ${eig.length} not divisible by m=$m")
    val dsub = eig.length / m
    val logs = new Array[Double](m)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    eig.indices.foreach { c =>
      var best = -1
      var s = 0
      while (s < m) {
        if (buckets(s).length < dsub && (best < 0 || logs(s) < logs(best)))
          best = s
        s += 1
      }
      buckets(best) += c
      logs(best) += math.log(math.max(eig(c), 1e-300))
    }
    buckets.flatMap(_.toSeq).toArray
  }

  /** Rotate a vector column into OPQ space: PCA projection (the q181
    * decimal-moment + Jacobi machinery, deterministic) permuted by the
    * balanced allocation. Pure column expressions. */
  private def opqRotate(df: DataFrame, vecCol: String, pca: Pca.PcaModel,
                        perm: Array[Int], outCol: String): DataFrame =
    Pca.transform(df, vecCol, pca, "_opq_rot")
      .withColumn(outCol,
        array(perm.map(i => element_at(col("_opq_rot"), i + 1)): _*))
      .drop("_opq_rot")

  /** Driver-side twin of [[opqRotate]] for the query — same
    * left-associated dot order as the column path, so the rotated
    * query is bit-identical to what the corpus rows went through. */
  private[graft] def opqRotateQuery(model: OpqModel,
                                  q: Array[Double]): Array[Double] = {
    require(q.length == model.pca.dim,
      s"opq: query dim ${q.length} != model dim ${model.pca.dim}")
    model.perm.map { c =>
      val w = model.pca.components(c)
      var dot = 0.0
      var i = 0
      while (i < q.length) { dot += q(i) * w(i); i += 1 }
      var muDot = 0.0
      i = 0
      while (i < q.length) { muDot += model.pca.mean(i) * w(i); i += 1 }
      dot - muDot
    }
  }

  /**
   * OPQ-PARAMETRIC training (Ge, He, Ke & Sun, CVPR 2013 §4; the faiss
   * OPQMatrix PCA regime): learn an ORTHOGONAL pre-rotation R for PQ
   * as full-rank PCA + eigenvalue-balanced subspace allocation, then
   * train the PQ codebook in rotated space. Rotation preserves L2
   * exactly, so ADC distances in rotated space estimate ORIGINAL
   * distances — but subspaces now carry balanced, decorrelated
   * variance, which is the quantization-error win over raw PQ
   * (pinned by [[pqReconstructionError]] in the gate). Everything is
   * deterministic: decimal moments + fixed-sweep Jacobi (PCA), greedy
   * allocation, and [[pqTrain]]'s decimal k-means.
   *
   * Scale: one extra corpus pass for the moments (d²/2 slim rows per
   * partition through the shuffle), one narrow rotate projection per
   * downstream scan; training cost is [[pqTrain]]'s unchanged.
   */
  def opqTrain(df: DataFrame, vecCol: String, idCol: String,
               m: Int = 4, k: Int = 16, iters: Int = 2): OpqModel = {
    val d = df.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"vector dim $d not divisible by m = $m")
    val pca = Pca.fit(df, vecCol, d)
    val perm = opqAllocate(pca.eigenvalues, m)
    val rot = opqRotate(df, vecCol, pca, perm, "_opq")
    OpqModel(pca, perm, pqTrain(rot, "_opq", idCol, m, k, iters))
  }

  /** Encode with a trained [[OpqModel]]: rotate, then PQ-encode. */
  def opqEncode(df: DataFrame, vecCol: String, idCol: String,
                model: OpqModel): DataFrame =
    pqEncode(opqRotate(df, vecCol, model.pca, model.perm, "_opq"),
      "_opq", idCol, model.pq)

  /** ADC top-k against OPQ codes: the query is rotated driver-side and
    * searched with the rotated-space codebook. */
  def opqSearchAdc(codes: DataFrame, idCol: String, model: OpqModel,
                   query: Array[Double], k: Int): DataFrame =
    pqSearchAdc(codes, idCol, model.pq, opqRotateQuery(model, query), k)

  /** Two-stage OPQ retrieval: rotated-space ADC candidates, exact
    * re-rank on the ORIGINAL vectors with the ORIGINAL query — valid
    * because the rotation is orthogonal (rotated and original L2 agree
    * exactly), and it keeps the refined distances bit-comparable to a
    * plain exact search. */
  def opqSearchAdcRefine(codes: DataFrame, vectors: DataFrame,
                         vecCol: String, idCol: String, model: OpqModel,
                         query: Array[Double], k: Int,
                         rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1, got k=$k rerank=$rerank")
    val cands = opqSearchAdc(codes, idCol, model, query, rerank)
      .select(col(idCol))
    exactRerankOn(vectors, vecCol, idCol, cands, query, k)
  }

  /** Corpus PQ RECONSTRUCTION error — Σ over rows and subspaces of the
    * assigned centroid's squared distance (the objective OPQ
    * minimizes; decimal-accumulated so the comparison is stable). Pass
    * the frame in the space the model was trained in. */
  def pqReconstructionError(df: DataFrame, vecCol: String,
                            model: PqModel): Double = {
    val subs = df.select(posexplode(array((0 until model.m).map(s =>
        slice(col(vecCol), s * model.dsub + 1, model.dsub)): _*))
      .as(Seq("s", "sub")))
    val r = subs
      .select(PqFunctions.pq_min_dist(col("s"), col("sub"),
        model.centroids).cast("decimal(38,18)").as("e"))
      .agg(sum(col("e"))).head()
    require(!r.isNullAt(0), "pqReconstructionError: empty frame")
    r.getDecimal(0).doubleValue()
  }

  // ---- MaxSim late-interaction retrieval -----------------------------------

  /**
   * MaxSim top-k — ColBERT's late interaction (Khattab & Zaharia,
   * SIGIR 2020) as an operator: documents carry a SET of token vectors
   * (`ArrayType(ArrayType(float|double))`), the query is a token-vector
   * set, and the score is Σ over query tokens of the best-matching doc
   * token's dot product — each query token independently reads the
   * document. One codegen'd kernel call per row
   * ([[MaxSimExpr]] — the query set rides `addReferenceObj`), head via
   * TakeOrderedAndProject. Determinism: dots accumulate left-ascending,
   * the per-token max is order-free, the token sum is query-order
   * pinned; ties (score desc, id asc). Output (idCol, maxsim).
   */
  def maxSimTopK(corpus: DataFrame, multiVecCol: String, idCol: String,
                 queryTokens: Array[Array[Double]], k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(queryTokens.nonEmpty && queryTokens.forall(_.length == queryTokens(0).length),
      "maxSimTopK: query tokens must be nonempty and same-dimensional")
    corpus.select(col(idCol),
        PqFunctions.maxsim(col(multiVecCol), queryTokens).as("maxsim"))
      .orderBy(col("maxsim").desc, col(idCol).asc).limit(k)
  }

  // ---- ANN evaluation harness ----------------------------------------------

  /**
   * Recall@k of an approximate retrieval against its exact ground
   * truth — the faiss-benchmarks evaluation loop as an operator: both
   * inputs are (queryIdCol, idCol) result frames (any extra columns
   * ignored), output one row per ground-truth query —
   * (queryIdCol, n_common, recall) with recall = |approx ∩ exact| / k.
   * Queries with no approximate results at all score 0 (an ANN that
   * returns nothing is recall 0, not a dropped row). Pure slim-key
   * join + count — integer arithmetic, engine-replayable exactly.
   */
  def annRecallAtK(approx: DataFrame, exact: DataFrame, queryIdCol: String,
                   idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val a = approx.select(col(queryIdCol).as("_q"), col(idCol).as("_i"))
      .distinct()
    val e = exact.select(col(queryIdCol).as("_q"), col(idCol).as("_i"))
      .distinct()
    e.join(a, Seq("_q", "_i"), "left_semi")
      .groupBy(col("_q")).agg(count(lit(1)).as("_n"))
      .join(e.select(col("_q")).distinct(), Seq("_q"), "right")
      .select(col("_q").as(queryIdCol),
        coalesce(col("_n"), lit(0L)).as("n_common"),
        (coalesce(col("_n"), lit(0L)).cast("double") / k).as("recall"))
  }

  // ---- MMR diversified retrieval -------------------------------------------

  /** Driver-side twin of the codegen'd `cosine_sim` kernel
    * ([[TextOps.cosineF]]): left-ascending float-widened double sums,
    * dot / (‖a‖·‖b‖) with ONE division, zero-norm → 0.0 — bit-identical
    * to what the column path computed for the same pair. */
  private[graft] def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Double = {
      val n = math.min(x.length, y.length)
      var s = 0.0; var i = 0
      while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    val na = math.sqrt(dot(a, a)); val nb = math.sqrt(dot(b, b))
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /**
   * MMR — maximal-marginal-relevance diversified top-k (Carbonell &
   * Goldstein, SIGIR 1998): greedily pick the candidate maximizing
   * `λ·cos(q, d) − (1−λ)·max_{s∈selected} cos(d, s)` — relevance traded
   * against redundancy with what's already picked, the standard
   * diversification re-rank over any retrieval stack (brute-force / ANN
   * / RRF candidates alike).
   *
   * Scale shape: the RELEVANCE pass is distributed (one codegen'd
   * cosine per corpus row + TakeOrderedAndProject bounded heaps — never
   * a sort shuffle); the greedy selection is inherently sequential in k
   * and quadratic in the candidate set, so it runs driver-side over the
   * collected top-`nCand` candidates under a loud `maxCand` guard —
   * corpus-size-independent, the [[Ivf]] nprobe/rerank playbook.
   * Determinism: relevance, pairwise sims, and the driver greedy all
   * replay [[TextOps.cosineF]]'s exact fp shape; score ties break to
   * the smaller id; `1−λ` is computed as the IEEE double `1.0 - lambda`
   * in both engines. Output (mmr_rank, idCol, rel) with rel rounded
   * 6 dp (Spark round = HALF_UP, replicated driver-side).
   */
  def mmrTopK(corpus: DataFrame, vecCol: String, idCol: String,
              query: Array[Float], k: Int, lambda: Double, nCand: Int,
              maxCand: Int = 4096): DataFrame = {
    require(k >= 1 && nCand >= k, s"need nCand >= k >= 1, got k=$k nCand=$nCand")
    require(lambda >= 0.0 && lambda <= 1.0, s"need lambda in [0,1], got $lambda")
    require(nCand <= maxCand,
      s"mmrTopK: nCand=$nCand exceeds maxCand=$maxCand — the greedy stage is " +
        "O(nCand²) on the driver; raise the cap only if the driver can hold it")
    val spark = corpus.sparkSession
    val qlit = array(query.map(lit(_)): _*)
    val scored = corpus
      .select(col(idCol), col(vecCol).cast("array<float>").as("_v"),
        cosine_sim(col(vecCol), qlit).as("_rel"))
      .filter(col("_rel").isNotNull)
      .orderBy(col("_rel").desc, col(idCol).asc).limit(nCand)
    val rows = scored.collect()
    require(rows.nonEmpty, "mmrTopK: no scorable candidates")
    val ids = rows.map(_.get(0))
    val vecs = rows.map(_.getSeq[Float](1).toArray)
    val rels = rows.map(_.getDouble(2))
    val idOrd: Ordering[Any] = ids(0) match {
      case _: Long => Ordering.by(_.asInstanceOf[Long])
      case _: Int => Ordering.by(_.asInstanceOf[Int])
      case _: String => Ordering.by(_.asInstanceOf[String])
      case other => throw new IllegalArgumentException(
        s"mmrTopK: unsupported id type ${other.getClass.getName}")
    }
    val oneMinus = 1.0 - lambda
    val n = rows.length
    val picked = new Array[Int](math.min(k, n))
    val taken = new Array[Boolean](n)
    // anchor: candidates arrive (rel desc, id asc) — index 0 is argmax rel
    picked(0) = 0; taken(0) = true
    var step = 1
    while (step < picked.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) {
          var maxSim = Double.NegativeInfinity
          var j = 0
          while (j < step) {
            val s = cosLocal(vecs(i), vecs(picked(j)))
            if (s > maxSim) maxSim = s
            j += 1
          }
          val score = lambda * rels(i) - oneMinus * maxSim
          if (score > bestScore ||
              (best >= 0 && score == bestScore && idOrd.lt(ids(i), ids(best)))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      require(best >= 0,
        "mmrTopK: no candidate produced a comparable score (NaN vectors?)")
      picked(step) = best; taken(best) = true
      step += 1
    }
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val outSchema = StructType(Seq(
      StructField("mmr_rank", IntegerType, nullable = false),
      scored.schema(idCol).copy(name = idCol),
      StructField("rel", org.apache.spark.sql.types.DoubleType)))
    val out = picked.zipWithIndex.map { case (ci, r) =>
      val relRounded = java.math.BigDecimal.valueOf(rels(ci))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      org.apache.spark.sql.Row(r + 1, ids(ci), relRounded)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1), outSchema)
  }

  // ---- Model artifact lifecycle (train once, search daily) ----------------

  /** Persist a [[PqModel]] as a one-row parquet artifact (doubles
    * roundtrip parquet bit-exactly) — the q153/q185 resume contract
    * applied to the vector ladder: train once on the big corpus,
    * encode/search in every later session without retraining. */
  def pqSaveModel(spark: org.apache.spark.sql.SparkSession, model: PqModel,
                  path: String): Unit = {
    import spark.implicits._
    Seq((model.m, model.k, model.dsub,
        model.centroids.map(_.map(_.toSeq).toSeq).toSeq))
      .toDF("m", "k", "dsub", "centroids")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a saved [[PqModel]]; schema- and shape-validated loudly. */
  def pqLoadModel(spark: org.apache.spark.sql.SparkSession,
                  path: String): PqModel = {
    val df = spark.read.parquet(path)
    require(df.columns.toSet == Set("m", "k", "dsub", "centroids"),
      s"pqLoadModel: $path is not a PQ artifact (columns ${df.columns.mkString(",")})")
    val rows = df.limit(2).collect()
    require(rows.length == 1, s"pqLoadModel: expected 1 row, got ${rows.length}")
    val r = rows(0)
    val cents = r.getAs[collection.Seq[collection.Seq[collection.Seq[Double]]]]("centroids")
      .map(_.map(_.toArray).toArray).toArray
    val (m, k, dsub) = (r.getAs[Int]("m"), r.getAs[Int]("k"), r.getAs[Int]("dsub"))
    require(cents.length == m && cents.forall(s => s.length == k &&
        s.forall(_.length == dsub)),
      s"pqLoadModel: centroid shape does not match m=$m k=$k dsub=$dsub")
    PqModel(m, k, dsub, cents)
  }

  /** Persist an [[OpqModel]] (PCA rotation + allocation + rotated-space
    * codebook) as a one-row parquet artifact. */
  def opqSaveModel(spark: org.apache.spark.sql.SparkSession, model: OpqModel,
                   path: String): Unit = {
    import spark.implicits._
    Seq((model.pca.dim, model.pca.n, model.pca.mean.toSeq,
        model.pca.components.map(_.toSeq).toSeq, model.pca.eigenvalues.toSeq,
        model.perm.toSeq, model.pq.m, model.pq.k, model.pq.dsub,
        model.pq.centroids.map(_.map(_.toSeq).toSeq).toSeq))
      .toDF("dim", "n", "mean", "components", "eigenvalues", "perm",
        "m", "k", "dsub", "centroids")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a saved [[OpqModel]]; schema- and shape-validated loudly. */
  def opqLoadModel(spark: org.apache.spark.sql.SparkSession,
                   path: String): OpqModel = {
    val df = spark.read.parquet(path)
    val want = Set("dim", "n", "mean", "components", "eigenvalues", "perm",
      "m", "k", "dsub", "centroids")
    require(df.columns.toSet == want,
      s"opqLoadModel: $path is not an OPQ artifact (columns ${df.columns.mkString(",")})")
    val rows = df.limit(2).collect()
    require(rows.length == 1, s"opqLoadModel: expected 1 row, got ${rows.length}")
    val r = rows(0)
    val dim = r.getAs[Int]("dim")
    val pca = Pca.PcaModel(dim, r.getAs[Long]("n"),
      r.getAs[collection.Seq[Double]]("mean").toArray,
      r.getAs[collection.Seq[collection.Seq[Double]]]("components")
        .map(_.toArray).toArray,
      r.getAs[collection.Seq[Double]]("eigenvalues").toArray)
    val perm = r.getAs[collection.Seq[Int]]("perm").toArray
    val cents = r.getAs[collection.Seq[collection.Seq[collection.Seq[Double]]]]("centroids")
      .map(_.map(_.toArray).toArray).toArray
    val (m, k, dsub) = (r.getAs[Int]("m"), r.getAs[Int]("k"), r.getAs[Int]("dsub"))
    require(pca.mean.length == dim && pca.components.length == dim &&
        pca.components.forall(_.length == dim) && perm.length == dim &&
        perm.sorted.sameElements(0 until dim),
      s"opqLoadModel: rotation shape does not match dim=$dim")
    require(cents.length == m && cents.forall(s => s.length == k &&
        s.forall(_.length == dsub)) && m * dsub == dim,
      s"opqLoadModel: centroid shape does not match m=$m k=$k dsub=$dsub dim=$dim")
    OpqModel(pca, perm, PqModel(m, k, dsub, cents))
  }

  // ---- Binary (1-bit) quantization + Hamming search ------------------------

  /**
   * Per-dimension binarization thresholds = the EXACT per-dim mean,
   * decimal-accumulated (floats cast to decimal exactly; decimal sums
   * are order-independent) so the threshold vector is deterministic
   * across partitionings and engines. One corpus pass, d slim sums.
   * For zero-centered embeddings pass `Array.fill(d)(0.0)` instead —
   * the classic sign code — and skip the pass entirely.
   */
  def binaryThresholds(df: DataFrame, vecCol: String): Array[Double] = {
    val d = df.select(size(col(vecCol))).head().getInt(0)
    require(d >= 1, s"binaryThresholds: empty vectors in $vecCol")
    val aggs = (0 until d).map(i =>
      sum(element_at(col(vecCol), i + 1).cast("decimal(38,12)")).as(s"_s$i")) :+
      count(lit(1)).as("_n")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(d)
    require(n > 0, "binaryThresholds: empty frame")
    (0 until d).map(i => r.getDecimal(i).doubleValue() / n).toArray
  }

  /**
   * Binary (1-bit) quantization — the faiss binary-index regime, the
   * cheapest rung of the compression ladder (SQ8 → PQ → OPQ → binary):
   * bit i = `vec_i > thresholds_i`, packed 64 dims per `long` by the
   * codegen'd [[BinPackExpr]] kernel. A 768-d float vector (3 KB)
   * becomes 12 longs (96 B): 32× smaller, and Hamming distance costs
   * 12 XOR+popcount instructions. Output (idCol, bits).
   */
  def binaryQuantize(df: DataFrame, vecCol: String, idCol: String,
                     thresholds: Array[Double]): DataFrame = {
    require(thresholds.nonEmpty, "binaryQuantize: empty thresholds")
    df.select(col(idCol),
      BinFunctions.binary_quantize(col(vecCol), thresholds).as("bits"))
  }

  /**
   * Hamming top-k over packed binary codes: the query is packed
   * driver-side by [[BinKernel.packLocal]] (bit-identical to the column
   * path), every code row gets one XOR-popcount kernel call, and the
   * top-k survives via order-by-limit (TakeOrderedAndProject — per-
   * partition bounded heaps, never a full sort shuffle). Ties break to
   * the smaller id. Output (idCol, hamming).
   */
  def binarySearchHamming(codes: DataFrame, idCol: String,
                          thresholds: Array[Double], query: Array[Double],
                          k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val q = BinKernel.packLocal(query, thresholds)
    codes.select(col(idCol),
        BinFunctions.hamming(col("bits"), q).as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc).limit(k)
  }

  /**
   * Two-stage binary retrieval: Hamming candidates (cheap, 1-bit) then
   * exact squared-L2 re-rank on the raw vectors — the standard
   * coarse-filter/exact-verify shape shared with [[pqSearchAdcRefine]].
   */
  def binarySearchRefine(codes: DataFrame, vectors: DataFrame,
                         vecCol: String, idCol: String,
                         thresholds: Array[Double], query: Array[Double],
                         k: Int, rerank: Int): DataFrame = {
    require(k >= 1 && rerank >= k, s"need rerank >= k >= 1, got k=$k rerank=$rerank")
    val cands = binarySearchHamming(codes, idCol, thresholds, query, rerank)
      .select(col(idCol))
    exactRerankOn(vectors, vecCol, idCol, cands, query, k)
  }

  /**
   * BATCH ADC search — the whole query frame against the codes in ONE
   * corpus pass: per-query distance tables stack into a single
   * reference object (nq·m·k doubles), the codegen'd `pq_adc_multi`
   * projection emits one distance per query per code row, and the
   * bounded [[TopKAggregate]] heap keeps k rows per query with
   * map-side partial aggregation — the shuffle carries k pairs per
   * query, never |codes|·|queries| scored rows. Queries are collected
   * to the driver under a loud cap (they are the SMALL side by
   * assumption — the [[bruteForceTopK]] broadcast posture; batch
   * bigger query sets yourself). Ids must be long-typed (the heap's
   * key type). Ties break (adc_dist asc, id asc) like [[pqSearchAdc]].
   * Output: (query_id, corpus_id, adc_dist, rank).
   */
  def pqSearchAdcAll(codes: DataFrame, idCol: String, model: PqModel,
                     queries: DataFrame, queryVecCol: String,
                     queryIdCol: String, k: Int,
                     maxQueries: Int = 4096): DataFrame = {
    val spark = codes.sparkSession
    val qRows = queries.select(col(queryIdCol).cast("long"), col(queryVecCol))
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"pqSearchAdcAll: query frame exceeds maxQueries=$maxQueries - the " +
        "batch tables live on the driver and ship to every task; split " +
        "the query set, or raise maxQueries deliberately.")
    require(qRows.nonEmpty, "pqSearchAdcAll: empty query frame")
    // a NULL id would silently read as 0 through getLong and a NULL
    // vector would NPE deep in the table build — refuse loudly instead
    qRows.foreach(r => require(!r.isNullAt(0) && !r.isNullAt(1),
      "pqSearchAdcAll: query rows must have non-NULL id and vector"))
    val qVec: Array[Array[Double]] = qRows.map(_.getSeq[Any](1).toArray.map {
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"non-numeric query vector element: $other")
    })
    val tables = qVec.map(adcTable(model, _))
    val qIds = qRows.map(_.getLong(0))
    import spark.implicits._
    val qMap = qIds.zipWithIndex.map { case (qid, i) => (i, qid) }
      .toSeq.toDF("_qidx", "query_id")
    codes.select(col(idCol).as("corpus_id"),
        posexplode(PqFunctions.pq_adc_multi(col("code"), tables))
          .as(Seq("_qidx", "_d")))
      .groupBy("_qidx")
      .agg(TopKAggregate.topk_by_score(col("corpus_id"), -col("_d"), k).as("top"))
      .join(broadcast(qMap), Seq("_qidx"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("corpus_id"),
        (-col("col.score")).as("adc_dist"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /**
   * Hybrid keyword+vector retrieval fused by Reciprocal Rank Fusion
   * (Cormack, Clarke & Buettcher, SIGIR 2009): the BM25 keyword head
   * ([[TextAnalysis.bm25Scores]] over `terms`) and the exact-cosine
   * vector head (against ONE broadcast query vector) each produce a
   * bounded top-`nCand` candidate list, and the fused score is the
   * calibration-free rank sum RRF(d) = Σ_heads 1/(rrfK + rank_head(d)).
   * This is the "hybrid search" primitive of OpenSearch / Vespa /
   * LanceDB: no score normalization across heterogeneous retrievers,
   * ranks only. A document missing from one head contributes only the
   * head it appears in (standard RRF — absent list = no term), and its
   * missing rank column stays NULL so the partial evidence is visible.
   *
   * `query` must be a single-row frame carrying the query vector in
   * `queryVecCol` (e.g. `embeddings.filter($"vec_id" === 7)`); rows
   * with a NULL vector or beyond the first are refused loudly rather
   * than silently fused into one ranking.
   *
   * Scale: both heads end in `orderBy.limit(nCand)` =
   * TakeOrderedAndProject — bounded per-partition heaps merged on the
   * driver, never a global sort; the corpus is scanned once per head
   * with zero shuffle of text or vectors. The rank windows and the
   * full-outer fusion join run on ≤ nCand rows per side (single
   * in-memory partition by design — that is the bound, not an
   * accident). Scores are pinned for cross-engine replay: bm25 is
   * 6 dp-rounded before ranking (its own contract), ranks are exact
   * ints, and the fused score rounds to 6 dp with id-asc tiebreak.
   */
  def hybridRrfTopK(docs: DataFrame, textCol: String, idCol: String,
                    terms: Seq[String],
                    vectors: DataFrame, vecIdCol: String, vecCol: String,
                    query: DataFrame, queryVecCol: String,
                    k: Int = 10, rrfK: Int = 60, nCand: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && nCand >= k, s"need nCand >= k >= 1, got k=$k nCand=$nCand")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    // single-query contract enforced in-plan: a 2nd row, an EMPTY frame,
    // or a NULL vector would silently corrupt the cosine ranking (empty
    // = keyword-only results), so fail loudly instead. A global agg is
    // the only shape that yields a row to evaluate even on EMPTY input
    // (a per-row window check never runs on zero rows); the asserts ride
    // INSIDE the kept column (assert_true yields NULL on success, so
    // coalesce falls through to the vector, evaluating left-to-right) —
    // as standalone projected-then-dropped columns Catalyst prunes them
    // away unevaluated
    val q1 = broadcast(query.limit(2)
      .agg(count(lit(1)).as("_n"), first(col(queryVecCol)).as("_qv0"))
      .select(coalesce(
        assert_true(col("_n") === 1,
          lit("hybridRrfTopK: query must be exactly one row")),
        assert_true(col("_qv0").isNotNull,
          lit("hybridRrfTopK: query vector is NULL")),
        col("_qv0")).as("_qv")))
    val wBm = Window.orderBy(col("_bm").desc, col("_id").asc)
    val bmCand = TextAnalysis.bm25Scores(docs, textCol, idCol, terms)
      .select(col(idCol).as("_id"), col("bm25").as("_bm"))
      .orderBy(col("_bm").desc, col("_id").asc).limit(nCand)
      .select(col("_id"), row_number().over(wBm).cast("int").as("bm25_rank"))
    val wCos = Window.orderBy(col("_cos").desc, col("_id").asc)
    val cosCand = vectors
      .select(col(vecIdCol).as("_id"), col(vecCol).as("_cv"))
      .crossJoin(q1)
      .select(col("_id"), cosine_sim(col("_cv"), col("_qv")).as("_cos"))
      .filter(col("_cos").isNotNull)
      .orderBy(col("_cos").desc, col("_id").asc).limit(nCand)
      .select(col("_id"), row_number().over(wCos).cast("int").as("cos_rank"))
    bmCand.join(cosCand, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol), col("bm25_rank"), col("cos_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("cos_rank")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc).limit(k)
  }
}
