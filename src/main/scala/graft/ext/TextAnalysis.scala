package graft.ext

import graft.core.Checkpoints.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import TextFunctions._

/**
 * Text analysis for training-data pipelines: token counting, quality
 * scoring, language id, fingerprinting. All column-level (codegen'd
 * built-ins + the custom expressions in TextExpressions) — no UDFs,
 * no driver loops; every metric is a narrow per-row projection.
 */
object TextAnalysis {

  /** Whitespace token count: O(n) codegen'd scan, exactly equivalent to
    * `size(split(trim(text), "\\s+"))` without materializing the array. */
  def tokenCount(text: Column): Column = token_count(text)

  /** BPE-ish subword proxy (letter runs | digit runs | single symbols):
    * O(n) scan equivalent to counting `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
    * matches, no regex engine and no array materialization. */
  def bpeTokenCount(text: Column): Column = bpe_count(text)

  def charCount(text: Column): Column = length(text)

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\.,;:!\\?'\"]", ""))).cast("double")
        / length(text))

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double")
        / length(text))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double")
        / length(text))

  private val stopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "that", "it", "was", "for", "with", "as", "on", "at", "this")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(stopwordsEn: _*))).cast("double") / size(toks))
  }

  def meanWordLength(text: Column): Column = {
    val toks = filter(split(trim(text), "\\s+"), t => length(t) > 0)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /**
   * Composite quality score in [0,1]: length sweet-spot, low punctuation
   * noise, presence of stopwords (prose-likeness), sane word lengths.
   * Heuristic weights; each component is a plain column expression.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopOk = least(stopwordRatio(text) * 4.0, lit(1.0))
    val mwl = meanWordLength(text)
    val wordOk = when(mwl.between(3.0, 9.0), 1.0).otherwise(0.3)
    (lenScore * 0.3 + punctOk * 0.2 + stopOk * 0.3 + wordOk * 0.2)
  }

  /** Corpus vocabulary: top-k whitespace tokens by frequency
    * (deterministic tiebreak on the token). One explode + one
    * map-side-combined hash aggregate — shuffle volume is #distinct
    * tokens, not corpus bytes. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(k)

  /** Benchmark decontamination: rows whose text contains ANY of the
    * needle strings (evaluation-set contamination check). The needle set
    * is broadcast as literals — the corpus is scanned once, no join. */
  def contaminated(df: DataFrame, textCol: String, needles: Seq[String]): DataFrame = {
    require(needles.nonEmpty, "needle set is empty")
    df.filter(needles.map(n => col(textCol).contains(n)).reduce(_ || _))
  }

  /** The keep-side twin of [[contaminated]]. */
  def decontaminate(df: DataFrame, textCol: String, needles: Seq[String]): DataFrame =
    df.filter(!needles.map(n => col(textCol).contains(n)).reduce(_ || _))

  /** THE word tokenizer of the text-analysis family: nonempty `\s+`
    * tokens of the lowercased text. Every operator that indexes,
    * counts, or n-grams word positions goes through this one
    * expression, and [[TextOps.wordShinglePairs]]'s hand-rolled scan is
    * the char-for-char kernel equivalent — change one and the span /
    * n-gram coordinate systems desynchronize, so change neither alone. */
  private[ext] def wordTokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /**
   * RAG document CHUNKING: overlapping token windows over the `\s+`
   * word stream — the retrieval-side complement of [[packSequences]]
   * (training packs across documents; retrieval splits within them).
   * Chunk i covers tokens `[i·stride, i·stride + chunkTokens)` with
   * `stride = chunkTokens − overlapTokens`; the count is
   * `1 + max(0, ⌈(n − chunkTokens)/stride⌉)`, so the tail chunk may be
   * short but every token lands in at least one chunk. Token positions
   * share [[wordTokens]]' coordinate system (lowercasing never moves a
   * whitespace boundary) but chunk text preserves ORIGINAL case —
   * retrieval wants the document, not the index key. Chunk text is
   * whitespace-normalized (tokens re-joined with single spaces).
   * Empty / all-whitespace documents produce ZERO chunks (there is
   * nothing to retrieve), not one empty chunk.
   *
   * Scale: pure column expressions end to end (split / sequence /
   * explode / slice / array_join — whole-stage codegen, no shuffle, no
   * UDF); output fan-out is ~n/stride rows per doc, each slim.
   * Output (idCol, chunk_id, n_chunks, chunk_start, chunk_tokens,
   * chunk_text).
   */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, overlapTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"need chunkTokens >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"need 0 <= overlapTokens < chunkTokens, got overlap=$overlapTokens chunk=$chunkTokens")
    val stride = chunkTokens - overlapTokens
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)
    val nChunks = greatest(lit(0),
      ceil((col("_n") - chunkTokens).cast("double") / stride).cast("int")) + 1
    df.select(col(idCol), toks.as("_toks"), size(toks).as("_n"))
      .filter(col("_n") > 0)
      .select(col(idCol), col("_toks"), col("_n"), nChunks.as("_nc"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .select(col(idCol), col("chunk_id"), col("_nc").as("n_chunks"),
        col("chunk_start"),
        least(lit(chunkTokens), col("_n") - col("chunk_start")).as("chunk_tokens"),
        array_join(slice(col("_toks"), col("chunk_start") + 1,
          least(lit(chunkTokens), col("_n") - col("chunk_start"))), " ")
          .as("chunk_text"))
  }

  /**
   * SENTENCE-ALIGNED chunking — [[chunkDocuments]]' sibling for RAG
   * pipelines that must not split mid-sentence: sentences are the
   * `[.!?]` + whitespace boundaries (the punctuation survives via a
   * marker rewrite — both engines' regex dialects replay it, no
   * lookbehind), each sentence lands in the chunk
   * `⌊start_token_offset / budgetTokens⌋` by its PREFIX-SUM start
   * offset (the q91 packing recipe), so the budget is approximate — a
   * sentence that begins before a boundary may overflow it, and a
   * single sentence longer than the budget keeps its own chunk —
   * stated, never mid-sentence-split. Chunk ids re-number densely per
   * document. Empty / all-whitespace documents (or sentences) emit
   * nothing. Output (idCol, chunk_id, n_sents, n_tokens, chunk_text)
   * with sentences re-joined by single spaces.
   *
   * Scale: marker rewrite + split + explode + two window passes over
   * (doc, sentence) rows + one groupBy — per-doc work bounded by the
   * document, no corpus-wide state.
   */
  def chunkSentences(df: DataFrame, textCol: String, idCol: String,
                     budgetTokens: Int): DataFrame = {
    require(budgetTokens >= 1, s"need budgetTokens >= 1, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    val marked = regexp_replace(col(textCol), "([.!?])\\s+", "$1\u0001")
    val sents = df
      .select(col(idCol), posexplode(split(marked, "\u0001"))
        .as(Seq("sid", "sent")))
      .filter(length(trim(col("sent"))) > 0)
      .withColumn("n_tok",
        size(filter(split(trim(col("sent")), "\\s+"), t => length(t) > 0)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("sid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketed = sents
      .withColumn("start", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bucket", (col("start") / budgetTokens).cast("int"))
      .withColumn("chunk_id",
        (dense_rank().over(Window.partitionBy(col(idCol))
          .orderBy(col("bucket"))) - 1).cast("int"))
    bucketed.groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).cast("int").as("n_sents"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        array_join(org.apache.spark.sql.functions.transform(
          array_sort(collect_list(struct(col("sid"), col("sent")))),
          e => e.getField("sent")), " ").as("chunk_text"))
  }

  /** Array of space-joined lowercase word n-grams (pure built-ins:
    * split + sequence + transform + slice — stays in codegen). */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = wordTokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /**
   * Exact n-gram overlap decontamination (the standard benchmark-
   * contamination method: a corpus doc is contaminated if it shares ANY
   * word-n-gram with the evaluation set). Distributed as a semi-join on
   * exploded n-grams: the benchmark side (thousands of docs) collapses to
   * a distinct-gram set and broadcasts; the corpus side streams
   * (id, gram) tuples through the broadcast hash join — no corpus
   * shuffle at all. For benchmark sets too big to broadcast, drop the
   * hint and let AQE pick a shuffle join on the same plan.
   */
  def ngramContaminatedIds(docs: DataFrame, textCol: String, idCol: String,
                           bench: DataFrame, benchTextCol: String,
                           n: Int): DataFrame = {
    // Phase 1 — hash prefilter: stream 64-bit gram hashes (word_shingles:
    // codegen'd single pass, no gram strings materialized) through a
    // broadcast semi-join. Hash-equal is implied by gram-equal, so this
    // yields a candidate SUPERSET (hash collisions possible, misses not).
    val benchHashes = bench
      .select(explode(word_shingles(col(benchTextCol), lit(n))).as("gh")).distinct()
    val candidates = docs
      .select(col(idCol), explode(word_shingles(col(textCol), lit(n))).as("gh"))
      .join(broadcast(benchHashes), Seq("gh"), "left_semi")
      .select(col(idCol)).distinct()
    // Phase 2 — exact verify on the candidate docs only: the full string
    // grams (the expensive explode) are built just for the (typically
    // sparse) contaminated slice, keeping the method exact end-to-end.
    // If contamination is dense enough that `candidates` outgrows the
    // broadcast threshold, drop the hint and AQE shuffles the same plan.
    val benchGrams = bench
      .select(explode(wordNgrams(col(benchTextCol), n)).as("gram")).distinct()
    docs.join(broadcast(candidates), Seq(idCol), "left_semi")
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(idCol).distinct()
  }

  /**
   * Contamination FRACTION audit frame — [[ngramContaminatedIds]]
   * gives the any-overlap boolean; curation pipelines (the GPT-3
   * 13-gram recipe and its descendants) instead THRESHOLD on how much
   * of a document's n-gram set hits the benchmark: (id, n_grams,
   * hit_grams, contamination = hit/|distinct grams|, 6 dp). Docs with
   * fewer than n tokens report (0, 0, 0.0).
   *
   * Scale: the same two-phase shape as the boolean — `n_grams` is a
   * per-row NARROW projection (distinct-gram count, no explode leaves
   * the row); hit counting explodes gram STRINGS only for the
   * hash-prefiltered candidate docs (64-bit shingle semi-join against
   * the broadcast bench hash set finds the typically-sparse slice;
   * hash-equal is implied by gram-equal so no hit is missed), then
   * verifies exactly against the broadcast bench gram strings.
   * (r15 optimization note: a fused one-pass rewrite — explode every
   * doc's distinct grams once, marker-join the broadcast bench set,
   * aggregate both counts — was measured row-identical but ~10% SLOWER
   * on the q146/q155 gates; the hash-domain prefilter plus the narrow
   * n_grams projection beats one string-gram explode of the whole
   * corpus. Kept the two-phase shape.)
   */
  def ngramContaminationFraction(docs: DataFrame, textCol: String,
                                 idCol: String,
                                 bench: DataFrame, benchTextCol: String,
                                 n: Int): DataFrame = {
    val benchHashes = bench
      .select(explode(word_shingles(col(benchTextCol), lit(n))).as("gh")).distinct()
    val candidates = docs
      .select(col(idCol), explode(word_shingles(col(textCol), lit(n))).as("gh"))
      .join(broadcast(benchHashes), Seq("gh"), "left_semi")
      .select(col(idCol)).distinct()
    val benchGrams = bench
      .select(explode(wordNgrams(col(benchTextCol), n)).as("gram")).distinct()
    // NO broadcast hint on `candidates` (unlike the boolean sibling):
    // the fraction frame's stated use is AUDITING dense contamination,
    // where candidates approach corpus cardinality — AQE broadcasts
    // the sparse case from runtime stats and shuffle-joins the dense
    val hits = docs.join(candidates, Seq(idCol), "left_semi")
      .select(col(idCol),
        explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("hit_grams"))
    // coalesce: NULL text propagates a NULL gram array through size()
    // (size-of-null = null in Spark 3+), and the documented contract is
    // "docs with fewer than n tokens report (0, 0, 0.0)" — unscorable
    // text has no grams, exactly like short text
    docs.select(col(idCol),
        coalesce(size(array_distinct(wordNgrams(col(textCol), n))).cast("long"),
          lit(0L)).as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .withColumn("hit_grams", coalesce(col("hit_grams"), lit(0L)))
      .withColumn("contamination", round(
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("hit_grams").cast("double") /
            col("n_grams").cast("double")), 6))
  }

  /**
   * Deterministic content-hash sampling: keep docs whose md5 first hex
   * digit falls in [0, keepBuckets) — stable across runs/engines (no RNG),
   * content-addressed (exact dups sample together, so dedup and sampling
   * commute), and trivially stratifiable by composing with a filter.
   * One narrow projection; sampling rate = keepBuckets/16.
   */
  def contentHashSample(df: DataFrame, textCol: String, keepBuckets: Int): DataFrame = {
    require(keepBuckets >= 0 && keepBuckets <= 16, "keepBuckets in [0,16]")
    df.filter(conv(substring(md5(col(textCol)), 1, 1), 16, 10).cast("int")
      < keepBuckets)
  }

  /**
   * Stratified deterministic sampling — the corpus-mixing primitive:
   * per-stratum keep rates (in 16ths, content-hash bucketed like
   * [[contentHashSample]]) reweight a mixed corpus toward a target
   * source/language distribution without RNG. Strata absent from `rates`
   * keep everything. One narrow filter, no shuffle, no collect; rates
   * compile to a literal CASE chain so the plan is a single codegen'd
   * scan at any corpus size.
   */
  def stratifiedHashSample(df: DataFrame, textCol: String, strataCol: String,
                           rates: Map[String, Int]): DataFrame = {
    require(rates.values.forall(v => v >= 0 && v <= 16), "rates in [0,16]")
    val bucket = conv(substring(md5(col(textCol)), 1, 1), 16, 10).cast("int")
    val rate = rates.foldLeft(lit(16)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /**
   * RAG CONTEXT ASSEMBLY under a token budget — the retrieval→prompt
   * step: per query, keep candidate chunks in (score desc, id asc)
   * order while the RUNNING token total stays within `budget`, and
   * STOP at the first overflow (prefix semantics — deliberately not a
   * skip-and-keep-filling knapsack: downstream prompts preserve rank
   * order, and "the best chunk was too big so we stuffed in three
   * worse ones" is a relevance regression, not a win; token totals
   * are monotone, so the prefix is exactly `cum <= budget`). Returns
   * `(queryCol, idCol, rank, cum_tokens)`.
   *
   * Scale: candidates arrive PRE-BOUNDED by the retrieval top-k
   * (|queries|·k rows), so the per-query window sort is over k rows —
   * never a corpus. Negative or NULL token counts are refused loudly
   * per row (a NULL would silently vanish from the running total and
   * overfill the prompt).
   */
  def assembleContext(cands: DataFrame, queryCol: String, idCol: String,
                      scoreCol: String, tokenCol: String,
                      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    import org.apache.spark.sql.expressions.Window
    val checked = when(col(tokenCol).isNull || col(tokenCol) < 0,
      raise_error(concat(lit("assembleContext: NULL/negative token "),
        lit("count for chunk "), col(idCol).cast("string"))).cast("long"))
      .otherwise(col(tokenCol).cast("long"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    cands
      .withColumn("_cum", sum(checked).over(w))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_cum") <= budget)
      .select(col(queryCol), col(idCol),
        col("_rk").cast("int").as("rank"),
        col("_cum").as("cum_tokens"))
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
   * algorithm A-ES): each row draws `u` in (0, 1] deterministically
   * from the md5 of its id (content-independent, cross-engine
   * reproducible, no RNG — the repo-wide hash-sampling convention),
   * forms the key `ln(u) / w` (order-equivalent to A-ES's `u^(1/w)`),
   * and the k LARGEST keys per group win — each row's inclusion
   * probability proportional to its weight, without replacement, in
   * one pass. Keys are rounded to 6 dp before ranking (the repo-wide
   * pin that keeps both engines' `ln` ulp classes comparable) with an
   * id-ascending tiebreak.
   *
   * Scale: per-group TOP-K via the bounded-heap aggregate
   * ([[TopKAggregate]]) — map-side partial heaps, the shuffle carries
   * k rows per (partition, group), never the corpus; no window, no
   * sort. Non-positive or NULL weights are refused loudly per row
   * (a silent 0-weight would be a silent drop; a negative one would
   * invert the order). Returns `(groupCol..., idCol, rank)`.
   */
  def weightedSample(df: DataFrame, weightCol: String, idCol: String,
                     k: Int, groupCol: Option[String] = None,
                     salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = col(weightCol).cast("double")
    val checkedW = when(w.isNull || w <= 0.0,
      raise_error(concat(
        lit("weightedSample: non-positive or NULL weight for id "),
        col(idCol).cast("string"))).cast("double"))
      .otherwise(w)
    // 13 md5 hex chars = 52 bits, exact in a double; +1 keeps u > 0
    val u = (conv(substring(md5(concat(lit(salt), lit(":"),
        col(idCol).cast("string"))), 1, 13), 16, 10).cast("double") +
      lit(1.0)) / lit(4503599627370496.0) // 2^52
    val key = round(log(u) / checkedW, 6)
    val gcols = groupCol.map(col).toSeq
    val scored = df.select(
      gcols :+ col(idCol).cast("long").as("_id") :+ key.as("_key"): _*)
    scored.groupBy(gcols: _*)
      .agg(TopKAggregate.topk_by_score(col("_id"), col("_key"), k).as("top"))
      .select(gcols :+ posexplode(col("top")): _*)
      .select(gcols ++ Seq(col("col.id").as(idCol),
        (col("pos") + 1).cast("int").as("rank")): _*)
  }

  /**
   * Corpus snapshot diff — the dataset-versioning primitive: classify
   * every doc id as `added` (only in new), `removed` (only in old),
   * `modified` (both, content hash differs) or `unchanged`. One
   * hash-partitioned full-outer join on the id (both sides project to
   * (id, hash) before the shuffle, so the join carries two slim columns
   * regardless of document size); at 100 TB co-locate by bucketing both
   * snapshots on the id.
   */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 textCol: String, idCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol), md5(col(textCol)).as("_old_hash"))
    val n = newDocs.select(col(idCol), md5(col(textCol)).as("_new_hash"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_old_hash").isNull, "added")
          .when(col("_new_hash").isNull, "removed")
          .when(col("_old_hash") === col("_new_hash"), "unchanged")
          .otherwise("modified").as("status"))
  }

  /** One-pass corpus card: doc/char/token totals, unique docs, mean doc
    * length (exact integer sums; the mean divides two exact BIGINTs so the
    * double is order-independent). Map-side combined aggregate — shuffle
    * carries one partial row per partition. */
  def corpusStats(df: DataFrame, textCol: String): DataFrame =
    df.agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        sum(token_count(col(textCol)).cast("long")).as("n_tokens"),
        countDistinct(md5(col(textCol))).as("n_unique_docs"))
      .withColumn("mean_chars",
        col("n_chars").cast("double") / col("n_docs"))

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII-pattern counts per document (emails, IPv4) — the redaction
    * pre-scan; codegen'd regexp_count, no UDFs. */
  def piiCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(emailRe)).cast("int").as("n_emails"),
      regexp_count(col(textCol), lit(ipv4Re)).cast("int").as("n_ipv4"))

  /** PII redaction: replace every email / IPv4 occurrence with a typed
    * placeholder (emails first, then addresses), reporting the counts
    * alongside the scrubbed text. Pure per-row regexp projection — the
    * redaction pass a training corpus takes before release costs one
    * codegen'd scan at any scale. */
  def redactPii(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(emailRe)).cast("int").as("n_emails"),
      regexp_count(col(textCol), lit(ipv4Re)).cast("int").as("n_ipv4"),
      regexp_replace(regexp_replace(col(textCol), emailRe, "[EMAIL]"),
        ipv4Re, "[IP]").as("redacted"))

  /** C4/Gopher-style repetition filters: fraction of duplicated tokens and
    * duplicated lines per document (high values flag boilerplate/spam). */
  def dupTokenFraction(text: Column): Column = {
    val toks = wordTokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    when(size(lines) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
  }

  /**
   * Gopher-style quality-filter verdicts (the public Rae et al. 2021
   * heuristic family, simplified to the signals this engine computes):
   * per-document boolean reasons plus the composite keep flag, as ONE
   * narrow projection — the reasons columns are what a pipeline logs to
   * audit WHY a doc was dropped, not just that it was.
   */
  def qualityFlags(df: DataFrame, textCol: String, idCol: String,
                   minTokens: Int = 50, maxTokens: Int = 100000,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   maxPunctRatio: Double = 0.1,
                   maxDupLineFrac: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val tokensOk = tokenCount(t).between(minTokens, maxTokens)
    val wordLenOk = meanWordLength(t).between(minMeanWordLen, maxMeanWordLen)
    val punctOk = punctRatio(t) <= maxPunctRatio
    val linesOk = dupLineFraction(t) <= maxDupLineFrac
    df.select(col(idCol),
      tokensOk.as("tokens_ok"), wordLenOk.as("word_len_ok"),
      punctOk.as("punct_ok"), linesOk.as("lines_ok"),
      (tokensOk && wordLenOk && punctOk && linesOk).as("keep"))
  }

  /**
   * GPT-style sequence packing (concatenate-and-chunk): documents are
   * laid end-to-end in `idCol` order and cut into fixed `seqLen`-token
   * training chunks; each document reports the chunk span it lands in and
   * whether a chunk boundary splits it. The global running token offset is
   * computed as a DISTRIBUTED prefix sum — `repartitionByRange` on the id,
   * a per-partition window (parallel local sorts, never a global
   * single-partition window), then an O(#partitions) offset broadcast —
   * the same two-pass shape as the engine's `assignIds`, so a 100 TB
   * corpus packs with one range shuffle and no driver-side row data.
   */
  /**
   * The two-pass distributed prefix sum shared by [[packSequences]]
   * (groupless) and [[tokenBudgetSelect]] (per-group): range-shuffle on
   * (groups ++ order) for parallel local sorts — NEVER a
   * single-partition-per-group window — then PIN the partitioning with
   * an eager localCheckpoint (the offset pass and the cumsum pass must
   * see identical partitions; AQE re-planning between the two actions
   * must not re-split the range bounds), per-(partition, groups) window
   * cumsums, per-(partition, groups) totals to the driver
   * (O(#partitions × #groups) slim rows, never row data; `maxDriverRows`
   * guards high-cardinality groupings loudly), and a null-safe
   * broadcast offset join back (a NULL group is a real group — an
   * equi-join would silently drop its rows).
   *
   * Returns the range-shuffled frame plus `_cum_prev` = the exact sum
   * of `valueCol` STRICTLY BEFORE each row in its group's order.
   */
  private def groupedPrefixSum(slimIn: DataFrame, groupCols: Seq[String],
                               orderCols: Seq[Column], valueCol: String,
                               maxDriverRows: Int,
                               guardMsg: Int => String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slim = slimIn
      .repartitionByRange((groupCols.map(col) ++ orderCols): _*)
      .lineageCut(true)
    val withPart = slim.withColumn("_part", spark_partition_id())
    val keys = ("_part" +: groupCols).map(col)
    val w = Window.partitionBy(keys: _*).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withPart.withColumn("_prev_local",
      coalesce(sum(col(valueCol).cast("long")).over(w), lit(0L)))
    val totals = withPart.groupBy(keys: _*)
      .agg(sum(col(valueCol).cast("long")).as("_t")).collect()
    require(totals.length <= maxDriverRows, guardMsg(totals.length))
    val offsetRows = totals.groupBy(r => groupCols.map(r.getAs[Any]))
      .toSeq.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(_.getAs[Int]("_part"))
        sorted.zip(sorted.map(_.getAs[Long]("_t")).scanLeft(0L)(_ + _).init)
          .map { case (r, off) => org.apache.spark.sql.Row.fromSeq(
            r.getAs[Int]("_part") +: groupCols.map(r.getAs[Any]) :+ off) }
      }
    val spark = slimIn.sparkSession
    val offsetDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1),
      StructType(StructField("_part", IntegerType) +:
        groupCols.map(g => withPart.schema(g).copy(name = "_g_" + g)) :+
        StructField("_offset", LongType)))
    val cond = ((local("_part") === offsetDf("_part")) +:
      groupCols.map(g => local(g) <=> offsetDf("_g_" + g))).reduce(_ && _)
    groupCols.foldLeft(
        local.join(broadcast(offsetDf), cond).drop(offsetDf("_part"))) {
        (d, g) => d.drop("_g_" + g) }
      .withColumn("_cum_prev", col("_prev_local") + col("_offset"))
      .drop("_prev_local", "_offset")
  }

  /** The (id, n_tokens) slim projection packing runs over: whitespace
    * token counts from `textCol` by default, or — when `tokenCountCol`
    * is set — a PRE-COMPUTED per-doc count column (e.g.
    * [[bpeSegmentCounts]]' `n_subwords`: a real pipeline packs by
    * TOKENIZER length, not whitespace words). NULL counts coalesce to
    * 0 (the convention the count producers already follow for empty
    * docs); `textCol` is not read in that mode. */
  private def packSlim(df: DataFrame, textCol: String, idCol: String,
                       extraCols: Seq[String],
                       tokenCountCol: Option[String]): DataFrame = {
    val cols = (idCol +: extraCols).map(col)
    tokenCountCol match {
      case Some(c) =>
        df.select(cols :+
          coalesce(col(c).cast("int"), lit(0)).as("n_tokens"): _*)
      case None =>
        // token_count mirrors split(trim(s),"\s+") which yields 1 for
        // the empty string; packing wants nonempty-token counts
        df.select(cols :+
          when(length(trim(col(textCol))) === 0, 0)
            .otherwise(tokenCount(col(textCol))).cast("int").as("n_tokens"): _*)
    }
  }

  def packSequences(df: DataFrame, textCol: String, idCol: String,
                    seqLen: Int,
                    tokenCountCol: Option[String] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // slim projection before the range shuffle: (id, n_tokens) only
    val slim = packSlim(df, textCol, idCol, Nil, tokenCountCol)
    val packed = groupedPrefixSum(slim, Nil, Seq(col(idCol)), "n_tokens",
        maxDriverRows = Int.MaxValue, _ => "unreachable")
      .withColumn("_last", col("_cum_prev") + col("n_tokens") - 1)
    // integer DIV, not floor(double/): exact past 2^53 tokens
    val startChunk = expr(s"_cum_prev DIV ${seqLen}L")
    val endChunk = when(col("n_tokens") === 0, startChunk)
      .otherwise(expr(s"_last DIV ${seqLen}L"))
    packed.select(col(idCol), col("n_tokens"),
      startChunk.as("start_chunk"), endChunk.as("end_chunk"),
      (endChunk > startChunk).as("crosses_boundary"))
  }

  /**
   * [[packSequences]] for REPLICATED corpora (the [[epochUpsample]]
   * output, where (id, copy) — not id — is the document key): same
   * two-pass distributed prefix sum, ordered by (id, copy) so every
   * replica is its own packed document and re-runs are deterministic.
   * Output (id, copy, n_tokens, start_chunk, end_chunk,
   * crosses_boundary).
   */
  def packSequencesReplicas(df: DataFrame, textCol: String, idCol: String,
                            copyCol: String, seqLen: Int,
                            tokenCountCol: Option[String] = None): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val slim = packSlim(df, textCol, idCol, Seq(copyCol), tokenCountCol)
    val packed = groupedPrefixSum(slim, Nil, Seq(col(idCol), col(copyCol)),
        "n_tokens", maxDriverRows = Int.MaxValue, _ => "unreachable")
      .withColumn("_last", col("_cum_prev") + col("n_tokens") - 1)
    val startChunk = expr(s"_cum_prev DIV ${seqLen}L")
    val endChunk = when(col("n_tokens") === 0, startChunk)
      .otherwise(expr(s"_last DIV ${seqLen}L"))
    packed.select(col(idCol), col(copyCol), col("n_tokens"),
      startChunk.as("start_chunk"), endChunk.as("end_chunk"),
      (endChunk > startChunk).as("crosses_boundary"))
  }

  /**
   * Per-source token-budget selection — the data-MIXING primitive a
   * pretraining pipeline runs after cleaning: within every `groupCol`
   * (source/domain/language), take documents greedily in descending
   * `scoreCol` order (ties broken by id, so the cut is deterministic)
   * until the source's token budget is exhausted. A document is kept
   * iff the cumulative token count THROUGH it stays ≤ `budgetTokens` —
   * the maximal score-prefix whose total fits, the take-while
   * convention (counts are non-negative, so the kept set is a prefix of
   * the score order; no knapsack backfilling, which would make the
   * output order-sensitive and un-oracle-able). Every input row comes
   * back annotated (n_tokens, cum_tokens, kept) — the audit frame a
   * mixing run logs — with tokens counted exactly like [[packSequences]]
   * (nonempty `\s+` tokens, empty text = 0), so budget math and packing
   * math agree downstream.
   *
   * Scale: the same two-pass distributed prefix sum as packSequences —
   * `repartitionByRange(group, score desc, id)` (parallel range sort,
   * NEVER a single-partition-per-group window: a 10^10-doc source would
   * serialize), per-partition window cumsums, then per-(partition,
   * group) totals to the driver for an offset broadcast. The driver
   * pass is O(#partitions · #groups) slim rows — groups are SOURCES
   * (dozens to thousands), and the guard throws loudly past 10^6 rows
   * rather than silently collecting a high-cardinality grouping.
   */
  def tokenBudgetSelect(df: DataFrame, textCol: String, idCol: String,
                        groupCol: String, scoreCol: String,
                        budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0L, "budgetTokens must be >= 0")
    val slim = df.select(col(idCol), col(groupCol),
        col(scoreCol).cast("double").as("_score"),
        when(length(trim(col(textCol))) === 0, 0)
          .otherwise(tokenCount(col(textCol))).cast("long").as("n_tokens"))
    groupedPrefixSum(slim, Seq(groupCol),
        Seq(col("_score").desc, col(idCol)), "n_tokens",
        maxDriverRows = 1000000,
        n => s"tokenBudgetSelect: $n (partition, group) totals \u2014 " +
          s"'$groupCol' looks like a high-cardinality key, not a source " +
          "column; the driver offset pass is sized for sources (dozens " +
          "to thousands). Pre-aggregate or bucket the grouping first.")
      .withColumn("cum_tokens", col("_cum_prev") + col("n_tokens"))
      .select(col(idCol), col(groupCol), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budgetTokens).as("kept"))
  }

  /**
   * BM25 (Okapi) relevance scores for a literal query-term set — the
   * keyword-retrieval cut used for corpus curation (find docs about X,
   * decontamination probes, quality-classifier features). One aggregation
   * pass computes N / total length / per-term document frequencies (a
   * single broadcast-able stats row; the shuffle carries one partial row
   * per partition), then scoring is a per-row projection over the
   * broadcast stats — no per-term joins, no inverted index, no UDFs
   * (array HOFs + codegen'd arithmetic). Scores are rounded to 6 dp so
   * the result is stable across libm implementations; docs matching no
   * term are dropped. At 100 TB this is one scan + one 1-row broadcast.
   */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    // per-row kernels only — token_occurrences/token_count are codegen'd
    // O(n) scans, so no token array is ever materialized (the split+filter
    // HOF alternative is CodegenFallback and allocates per row)
    val cols: Seq[Column] = col(idCol) +:
      when(length(trim(col(textCol))) === 0, 0)
        .otherwise(tokenCount(col(textCol))).cast("int").as("_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        token_occurrences(lower(col(textCol)), lit(t.toLowerCase)).as(s"_tf$i") }
    val base = df.select(cols: _*)
    val aggs: Seq[Column] =
      count(lit(1)).as("_n") +: sum(col("_dl").cast("long")).as("_sumdl") +:
      terms.indices.map { i =>
        sum((col(s"_tf$i") > 0).cast("long")).as(s"_df$i") }
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val avgdl = col("_sumdl").cast("double") / col("_n").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val dfT = col(s"_df$i").cast("double")
      val idf = log(lit(1.0) +
        (col("_n").cast("double") - dfT + 0.5) / (dfT + 0.5))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl").cast("double") / avgdl))
    }.reduce(_ + _)
    scored.select(col(idCol), col("_dl").as("doc_len"),
        round(score, 6).as("bm25"))
      .filter(col("bm25") > 0)
  }

  /**
   * CHUNK-level BM25 retrieval with document max-pooling — the standard
   * RAG retrieval shape: score [[chunkDocuments]]' windows as the BM25
   * corpus (chunk count and chunk-average length are the collection
   * stats — long documents no longer drown their own relevant passage),
   * then each document is represented by its BEST chunk and the top-k
   * documents come back with the winning chunk id — the "retrieve
   * passages, return documents" pooling used by passage-retrieval
   * systems (Karpukhin et al. 2020 take the same per-doc max over
   * passage scores).
   *
   * Scale: chunking and scoring are pure column expressions; pooling is
   * a struct-max groupBy (partial aggregation map-side — never a
   * per-doc collect); the head is TakeOrderedAndProject. Ties: best
   * chunk within a doc = (bm25 desc, chunk_id asc); ranking = (bm25
   * desc, idCol asc). Output (idCol, chunk_id, bm25).
   */
  def chunkBm25TopK(df: DataFrame, textCol: String, idCol: String,
                    chunkTokens: Int, overlapTokens: Int,
                    terms: Seq[String], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val chunks = chunkDocuments(df, textCol, idCol, chunkTokens, overlapTokens)
      .select(struct(col(idCol), col("chunk_id")).as("_ck"), col("chunk_text"))
    bm25Scores(chunks, "chunk_text", "_ck", terms, k1, b)
      .select(col("_ck").getField(idCol).as(idCol),
        col("_ck").getField("chunk_id").as("chunk_id"), col("bm25"))
      .groupBy(col(idCol))
      .agg(max(struct(col("bm25"), (-col("chunk_id")).as("_negc"))).as("_m"))
      .select(col(idCol), (-col("_m").getField("_negc")).as("chunk_id"),
        col("_m").getField("bm25").as("bm25"))
      .orderBy(col("bm25").desc, col(idCol)).limit(k)
  }

  /** Top-k BM25 retrieval: score + deterministic (score desc, id asc)
    * head. `orderBy.limit` plans as TakeOrderedAndProject — a bounded
    * per-partition heap merged on the driver, never a global sort. */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    bm25Scores(df, textCol, idCol, terms)
      .orderBy(col("bm25").desc, col(idCol)).limit(k)
  }

  /**
   * Line-level boilerplate removal (the CCNet/RefinedWeb recipe): a line
   * whose document frequency exceeds `maxDocFreq` is boilerplate
   * (headers, nav, cookie banners, license blurbs) and is dropped from
   * EVERY document; surviving lines keep their original order, and
   * documents whose every line is boilerplate survive as empty text
   * (row count is preserved). Shuffle discipline for 100 TB: the
   * doc-frequency aggregation and the anti-join travel on a 16-byte
   * TWO-hash key `(xxhash64(line), xxhash64(salt, line))`, never the
   * line text. A single 64-bit key collides at birthday ≈ 2^32 distinct
   * lines — well inside a 100 TB corpus, and a collision merges two
   * lines' doc frequencies, deleting a rare line that collided with
   * boilerplate; the second hash pushes the birthday bound to ≈ 2^64
   * distinct lines (collision probability < 10^-9 even at 10^14 lines —
   * see SCALE.md). The salt argument must come FIRST: Spark's
   * multi-argument xxhash64 chains left-to-right with the running hash
   * as seed, so a TRAILING salt would make the second hash a pure
   * function of the first (first-hash collisions would propagate and
   * the pair would be no stronger than 64 bits); salt-first makes it a
   * differently-SEEDED hash of the line. Reassembly is one groupBy(id)
   * over (pos, line) structs with an in-memory array_sort, bounded by
   * document size.
   */
  def removeBoilerplateLines(df: DataFrame, textCol: String, idCol: String,
                             maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val hashed = lines
      .withColumn("_lh", xxhash64(col("line")))
      .withColumn("_lh2", xxhash64(lit(0x9E3779B97F4A7C15L), col("line")))
    val boiler = hashed.select(col(idCol), col("_lh"), col("_lh2")).distinct()
      .groupBy("_lh", "_lh2").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDocFreq)
      .select("_lh", "_lh2")
    val kept = hashed.join(boiler, Seq("_lh", "_lh2"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line")), "\n").as(textCol))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  /**
   * Token-distribution drift between two corpus snapshots: each token's
   * contribution to KL(new || old) with add-one smoothing over the
   * union vocabulary — the monitoring primitive behind "did this
   * ingestion batch shift the corpus distribution", and the token-level
   * complement of [[corpusDiff]]'s row-level statuses.
   *
   *   contrib(t) = p_new(t) · log2(p_new(t) / p_old(t)),
   *   p(t) = (c(t) + 1) / (N + V)   (V = union vocabulary size)
   *
   * Σ contrib = the KL divergence; positive contributors are
   * over-represented in the new snapshot. Output: (token, c_old, c_new,
   * kl_contrib) for every union-vocabulary token.
   *
   * Scale: two slim (token, count) aggregations (map-side combined), a
   * full-outer join on token, and one broadcast totals row — shuffles
   * carry token counts, never documents.
   */
  def tokenDrift(oldDf: DataFrame, newDf: DataFrame,
                 textCol: String): DataFrame = {
    def counts(df: DataFrame): DataFrame = df
      .select(explode(wordTokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    // the union-vocabulary join is scanned twice (totals + output);
    // eager localCheckpoint materializes it ONCE — without it only the
    // exchanges are reused and the merge-join executes on both branches.
    // Vocabulary-sized (tokens, not documents), so the materialization
    // is bounded.
    val joined = counts(oldDf).select(col("token"), col("c").as("c_old"))
      .join(counts(newDf).select(col("token"), col("c").as("c_new")),
        Seq("token"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .lineageCut(true)
    val totals = joined.agg(
      sum(col("c_old")).cast("double").as("_tot_old"),
      sum(col("c_new")).cast("double").as("_tot_new"),
      count(lit(1)).cast("double").as("_v"))
    val pNew = (col("c_new") + lit(1.0)) / (col("_tot_new") + col("_v"))
    val pOld = (col("c_old") + lit(1.0)) / (col("_tot_old") + col("_v"))
    joined.crossJoin(broadcast(totals))
      .select(col("token"), col("c_old"), col("c_new"),
        round(pNew * log2(pNew / pOld), 6).as("kl_contrib"))
  }

  /**
   * Bigram self-perplexity quality scoring — the shape of CCNet-style
   * LM-perplexity filtering (public recipe: score documents by a
   * language model's cross-entropy; docs far from the corpus
   * distribution are low-quality or foreign). Here the model is a
   * bigram LM with add-one smoothing trained on the CORPUS ITSELF in
   * one pass, so the operator is self-contained and exactly
   * reproducible by a SQL oracle:
   *
   *   xent(doc) = -mean over doc bigrams of
   *               log2( (c(w1,w2) + 1) / (cleft(w1) + V) )
   *
   * with c = corpus bigram count, cleft = corpus count of w1 as a
   * bigram head, V = corpus distinct-token count. Lower = more typical.
   * Output: (id, n_bigrams, xent) — xent null for docs under 2 tokens.
   *
   * Scale: two slim-key count aggregations (map-side combined) + a
   * scoring join of exploded bigrams against the count tables — all
   * shuffles carry (token-pair, count) tuples, never documents. At
   * 100 TB the count tables are the persisted model artifact (compute
   * once, reuse per snapshot — the signature-table pattern):
   * [[trainBigramModel]] builds it, [[bigramEntropyUnderModel]] scores
   * ANY corpus under it (left-join + OOV smoothing), and this
   * self-scoring form is exactly `bigramEntropyUnderModel(df,
   * trainBigramModel(df))` — a production variant caps the vocabulary
   * at top-V with an OOV bucket so the model broadcasts.
   */
  def bigramSelfEntropy(df: DataFrame, textCol: String,
                        idCol: String): DataFrame = {
    // ONE composable lazy plan — the vocabulary size rides along as a
    // broadcast 1-row frame instead of [[trainBigramModel]]'s eager
    // `countDistinct` job (one count job per MODEL is the artifact
    // contract; one per self-scoring CALL was an avoidable full-corpus
    // pass — at 100 TB, real money). Semantically this is exactly
    // `bigramEntropyUnderModel(df, trainBigramModel(df, textCol))`: the
    // count joins may be left or inner (every scored bigram is in the
    // self-model by definition), and the token-free-corpus edge case
    // falls out of the left joins below — no bigram rows exist, so every
    // doc comes back (id, 0, null) without consulting V.
    val toks = tokensOf(df, textCol, col(idCol))
    val bigrams = bigramsOf(toks)
    val vocabF = toks.select(explode(col("w")).as("tok"))
      .agg(countDistinct(col("tok")).cast("double").as("_v"))
    val scored = bigrams
      .join(bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("_c")),
        Seq("w1", "w2"))
      .join(bigrams.groupBy("w1").agg(count(lit(1)).as("_cl")), Seq("w1"))
      .crossJoin(broadcast(vocabF))
      .select(col("id"),
        log2((col("_c") + lit(1.0)) / (col("_cl") + col("_v"))).as("_lp"))
    val agg = scored.groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), round(-avg(col("_lp")), 6).as("xent"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("xent"))
  }

  /**
   * The persisted bigram-LM artifact: slim (w1, w2, _c) bigram counts,
   * (w1, _cl) head counts, and the training vocabulary size. The two
   * frames are plain DataFrames so a pipeline writes them once as
   * parquet and reloads per scoring run (the signature-table pattern);
   * `vocab` travels alongside (it pins the smoothing denominator — a
   * model scored with a different V is a different model).
   */
  case class BigramModel(bigrams: DataFrame, heads: DataFrame, vocab: Long)

  /** Train the [[BigramModel]] count tables on a reference corpus: two
    * map-side-combined aggregations over exploded bigrams plus one
    * distinct-token count — shuffles carry (token-pair, count) tuples,
    * never documents. EAGER in `vocab` only (one count job). */
  def trainBigramModel(df: DataFrame, textCol: String): BigramModel = {
    val toks = tokensOf(df, textCol, lit(0L))
    val bigrams = bigramsOf(toks)
    val vocab = toks.select(explode(col("w")).as("tok"))
      .agg(countDistinct(col("tok"))).head.getLong(0)
    BigramModel(
      bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("_c")),
      bigrams.groupBy("w1").agg(count(lit(1)).as("_cl")),
      vocab)
  }

  /**
   * Score a corpus under an EXTERNAL reference model (the CCNet shape
   * proper: the model is trained on a trusted reference corpus, and
   * documents far from ITS distribution score high): per-doc mean
   * negative log2 of the add-one-smoothed bigram probability under
   * `model`'s counts. Unseen bigrams and heads must SCORE, not vanish —
   * both count joins are LEFT joins with missing counts as 0, so an
   * out-of-vocabulary bigram contributes -log2(1 / (cleft + V)) (and a
   * fully unseen head -log2(1/V), the smoothing floor) instead of
   * silently dropping out of an inner join and deflating the doc's
   * entropy. Output: (id, n_bigrams, xent · 6 dp), xent null under 2
   * tokens — identical shape to [[bigramSelfEntropy]].
   */
  def bigramEntropyUnderModel(df: DataFrame, textCol: String, idCol: String,
                              model: BigramModel): DataFrame = {
    // an empty reference model (vocab 0) would make every smoothed
    // probability 1/0 and every entropy infinite — refuse loudly
    require(model.vocab > 0,
      "bigram reference model has an empty vocabulary — it was trained " +
        "on an empty or token-free corpus")
    val bigrams = bigramsOf(tokensOf(df, textCol, col(idCol)))
    val v = lit(model.vocab.toDouble)
    val scored = bigrams
      .join(model.bigrams.select(col("w1"), col("w2"), col("_c")),
        Seq("w1", "w2"), "left")
      .join(model.heads.select(col("w1"), col("_cl")), Seq("w1"), "left")
      .na.fill(0L, Seq("_c", "_cl"))
      .select(col("id"),
        log2((col("_c") + lit(1.0)) / (col("_cl") + v)).as("_lp"))
    val agg = scored.groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), round(-avg(col("_lp")), 6).as("xent"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("xent"))
  }

  /** (id, w = lowercased whitespace tokens) — the bigram family's shared
    * tokenizer (must stay bit-identical between train and score). */
  private def tokensOf(df: DataFrame, textCol: String,
                       idExpr: org.apache.spark.sql.Column): DataFrame =
    df.select(idExpr.as("id"), wordTokens(col(textCol)).as("w"))

  /** Exploded (id, w1, w2) adjacent-token pairs for docs >= 2 tokens. */
  private def bigramsOf(toks: DataFrame): DataFrame =
    toks.filter(size(col("w")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /**
   * (id, host) for every DISTINCT http(s) URL host a document mentions —
   * the primitive behind domain-level filtering (blocklists, per-domain
   * caps via [[quotaTopK]], per-domain corpus stats). RFC 3986 makes
   * both the scheme and the host case-insensitive, so the scheme match
   * carries `(?i)` and hosts are lowercased BEFORE the distinct —
   * `Example.com` and `example.com` are one host, not two rows feeding
   * a downstream domain cap. One narrow regexp projection + explode;
   * no shuffle until the caller aggregates.
   */
  def urlHosts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(transform(regexp_extract_all(col(textCol),
        lit("(?i)https?://([A-Za-z0-9.-]+)"), lit(1)), h => lower(h)))).as("host"))

  /**
   * Canonical URL form for URL-level deduplication (the CommonCrawl-
   * pipeline normalization step: the same page fetched as
   * `HTTPS://WWW.Site.com/p/1/?utm_source=x#top` and
   * `https://site.com/p/1` must collide). Rules, applied in order:
   * scheme and host lowercased (RFC 3986 makes both case-insensitive);
   * userinfo (`user:pass@`) stripped from the authority — it neither
   * addresses content nor belongs in a persisted dedup key;
   * a leading `www.` stripped; the scheme's default port stripped
   * (`:443` for https, `:80` for http); the `#fragment` dropped;
   * tracking parameters dropped (`utm_*`, `fbclid`, `gclid`,
   * `msclkid`) with separators re-tidied — NON-tracking query params
   * are kept, they address different content; a dangling `?`/`&` and a
   * trailing path slash stripped. Non-http(s) input -> NULL. Pure
   * regexp/string built-ins — codegen'd, no UDF.
   */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "(?i)^(https?)://.*", 1))
    // the authority component may carry RFC 3986 userinfo
    // (`user:pass@host`); strip it BEFORE the www/port rules — it must
    // never survive into a persisted dedup key (credentials at rest),
    // and `https://user@site.com/a` must merge with `https://site.com/a`.
    // Greedy to the LAST '@' (WHATWG): a second '@' belongs to the
    // userinfo, not the host — same rule as [[urlHost]]
    val authority = lower(regexp_extract(url, "(?i)^https?://([^/?#]+).*", 1))
    val hostPort = regexp_replace(authority, "^.*@", "")
    val noWww = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(regexp_replace(noWww, ":80$", ""))
    val rest0 = regexp_extract(url, "(?i)^https?://[^/?#]+(.*)$", 1)
    val rest1 = regexp_replace(rest0, "#.*$", "")
    // left-anchored on [?&] so a tracking NAME matches only as a whole
    // param — never a suffix of a real one (?xgclid=5 is kept) and never
    // a path segment (/utm_zone=14/ is untouched); the kept separator
    // may double up, re-tidied below
    val rest2 = regexp_replace(rest1,
      "(?i)([?&])(?:utm_[a-z0-9_]*|fbclid|gclid|msclkid)=[^&#]*", "$1")
    val rest3 = regexp_replace(rest2, "&{2,}", "&")  // ?a=1&&b=2 -> &
    val rest4 = regexp_replace(rest3, "\\?&+", "?")  // ?&page=2 -> ?page=2
    val rest5 = regexp_replace(rest4, "[?&]+$", "")  // dangling separators
    val rest6 = regexp_replace(rest5, "/+(\\?|$)", "$1") // trailing slash run
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, rest6))
  }

  /** Lowercased host of an http(s) URL: authority minus RFC 3986
    * userinfo and any explicit port; NULL for non-http(s) input. */
  private[ext] def urlHost(url: Column): Column = {
    val authority = lower(regexp_extract(url, "(?i)^https?://([^/?#]+).*", 1))
    // userinfo strip is GREEDY to the LAST '@' (the WHATWG rule):
    // 'https://a@b@blocked.com' resolves host blocked.com in every
    // fetcher — a first-'@' strip would leave 'b@blocked.com' and let
    // a crafted URL walk past the blocklist
    val hostPort = regexp_replace(authority, "^.*@", "")
    val noPort = regexp_replace(hostPort, ":[0-9]+$", "")
    // IPv6 literals arrive bracketed ('https://[::1]:8080/x'); the port
    // strip above leaves '[::1]', which an IP-form blocklist entry
    // ('::1' — UT1 lists carry bare IPs) can never exact-match. Strip
    // the surrounding brackets AFTER the port strip (the ']' guards the
    // port regex from eating address segments).
    val noBracket = regexp_replace(noPort, "^\\[(.*)\\]$", "$1")
    // trailing-dot FQDN form ('blocked.com.') is the same site: strip
    // it, or its suffix chain never matches a normal blocklist entry
    val h = regexp_replace(noBracket, "\\.+$", "")
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /**
   * Domain-blocklist annotation — the UT1-blocklist stage of
   * RefinedWeb-shaped pipelines (Penedo et al. 2023 §3.1 run the
   * Université de Toulouse adult/fraud domain lists): a doc is blocked
   * when its URL's host IS a listed domain or a SUBDOMAIN of one.
   * Matching is on label boundaries only — host == d, or host ends with
   * "." + d — never substring (`notexample.com` survives a block on
   * `example.com`). Every input row comes back annotated:
   * `host` (NULL for non-http(s)/NULL URLs — unattributable rows are
   * visibly unmatched, not dropped) and `blocked_domain` (the matched
   * list entry, deepest match when several nest, NULL when clean).
   * [[blockByDomain]] applies the keep filter.
   *
   * Scale: the host explodes into its dot-suffix chain (≤ ~10 labels a
   * host, slim (id, suffix) rows) and the list joins on the EXACT
   * suffix — a broadcast hash join for any real blocklist (UT1 ≈ 4M
   * domains ≈ 100 MB serialized, inside broadcast range; a bigger list
   * degrades to a shuffle join on the slim suffix key by dropping the
   * broadcast hint). No per-row O(|list|) scan and no regex
   * alternation over millions of domains; the deepest-match rollup is
   * a map-side-combined max over ≤ labels rows per doc.
   */
  def domainBlocklistFlags(df: DataFrame, urlCol: String, idCol: String,
                           blocked: DataFrame, domainCol: String): DataFrame = {
    // loud output-column contract (the convention elsewhere in this
    // file): the annotation writes `host` and `blocked_domain`, and a
    // pre-existing column of either name would be silently overwritten
    // by withColumn / shadowed through the join
    require(!df.columns.contains("host") && !df.columns.contains("blocked_domain"),
      "domainBlocklistFlags writes output columns 'host' and " +
        "'blocked_domain'; rename or drop the input's columns of those " +
        "names first")
    // entry hygiene: real UT1 list files carry blank lines (an empty
    // entry would match the empty suffix) and occasional trailing-dot
    // FQDN forms — normalize both before the join
    val b = broadcast(blocked
      .select(regexp_replace(lower(trim(col(domainCol))), "\\.+$", "").as("_bd"))
      .filter(length(col("_bd")) > 0).distinct())
    val labels = split(urlHost(col(urlCol)), "\\.")
    val suffixes = transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels) - i), "."))
    val matched = df
      .select(col(idCol).as("_id"),
        explode(when(urlHost(col(urlCol)).isNull, array().cast("array<string>"))
          .otherwise(suffixes)).as("_suffix"))
      .join(b, col("_suffix") === col("_bd"))
      .groupBy(col("_id"))
      .agg(max(struct(length(col("_bd")).as("l"), col("_bd").as("d")))
        .getField("d").as("blocked_domain"))
    df.withColumn("host", urlHost(col(urlCol)))
      .join(matched, df(idCol) === col("_id"), "left")
      .drop("_id")
  }

  /** Keep-side of [[domainBlocklistFlags]]: rows whose host matches no
    * blocklist entry (NULL-host rows kept — see the flags contract). */
  def blockByDomain(df: DataFrame, urlCol: String, idCol: String,
                    blocked: DataFrame, domainCol: String): DataFrame =
    domainBlocklistFlags(df, urlCol, idCol, blocked, domainCol)
      .filter(col("blocked_domain").isNull)
      .drop("host", "blocked_domain")

  /**
   * URL-level dedup rollup: one row per [[canonicalizeUrl]] group —
   * (canonical_url, n_docs, keeper_id = min id), rows whose URL fails
   * to canonicalize (non-http(s)) excluded. The keep set a crawl
   * pipeline applies BEFORE any content-level dedup: colliding fetches
   * of the same page never reach the expensive MinHash/ExactSubstr
   * stages. One hash aggregate on the canonical key — map-side partial
   * agg, shuffle = one slim row per distinct URL, no caps needed.
   */
  def urlDedupGroups(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("canonical_url"), col(idCol))
      .filter(col("canonical_url").isNotNull)
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))

  /**
   * [[removeDuplicatedSpans]] driven to its fixed point: re-cut until
   * [[duplicatedSpans]] finds nothing (cutting a span can make
   * previously-separated tokens adjacent and mint NEW duplicated
   * k-grams — pass 1 cannot see those). Returns (idCol, textCol,
   * kept_tokens) like the single pass.
   *
   * Scale: each round is the single-pass plan (slim gram-key shuffle +
   * narrow cut) over the SHRINKING corpus, with a `localCheckpoint`
   * between rounds so the lineage stays one-round deep instead of
   * re-deriving every earlier cut per round — the same driver-loop
   * shape as [[Dedup.connectedComponents]]'s pointer doubling. Real
   * corpora converge in 2–3 rounds (a fresh duplicate needs freshly
   * adjacent text on BOTH sides of a cut); `maxIters` bounds the
   * pathological case and non-convergence throws rather than returning
   * a corpus that still contains duplicated substrings.
   */
  def removeDuplicatedSpansToFixedPoint(
      df: DataFrame, textCol: String, idCol: String, k: Int,
      minCount: Int = 2, maxIters: Int = 8): DataFrame = {
    require(maxIters >= 1, "maxIters must be >= 1")
    // uniform output contract: EVERY doc in normalized token form
    // (lowercased, single-space), exactly like the single pass — the
    // zero-cut path must not return verbatim text while the >=1-cut
    // path returns rewritten text
    def finish(d: DataFrame): DataFrame = d
      .withColumn("_kt", wordTokens(col(textCol)))
      .select(col(idCol), array_join(col("_kt"), " ").as(textCol),
        size(col("_kt")).cast("long").as("kept_tokens"))
    var cur = df.select(col(idCol), col(textCol))
    var it = 0
    while (it < maxIters) {
      // one materialization per round: the spans frame (small, per-doc)
      // serves BOTH the convergence check and the cut —
      // duplicatedSpans never runs twice over the same corpus
      val spans = duplicatedSpans(cur, textCol, idCol, k, minCount)
        .lineageCut()
      if (spans.limit(1).count() == 0L) return finish(cur)
      cur = cutSpans(cur, spans, textCol, idCol)
        .select(col(idCol), col(textCol)).lineageCut()
      it += 1
    }
    val residual = duplicatedSpans(cur, textCol, idCol, k, minCount)
      .limit(1).count()
    if (residual > 0L) throw new IllegalStateException(
      s"span removal did not converge in $maxIters rounds: duplicated " +
      s"$k-grams remain. Raise maxIters, or use one removeDuplicatedSpans " +
      "pass deliberately if a best-effort cut is acceptable.")
    finish(cur)
  }

  /**
   * Within-document repeated-line removal — the intra-doc complement of
   * [[removeBoilerplateLines]] (the RefinedWeb/MassiveText "repetition
   * removal" family): each document keeps only the FIRST occurrence of
   * every line, order preserved. A pure narrow projection —
   * `array_distinct` preserves first-occurrence order — so there is no
   * shuffle at all: at 100 TB this is a scan-bound single pass, the
   * optimum for the op class.
   */
  def dedupLinesWithinDoc(df: DataFrame, textCol: String,
                          idCol: String): DataFrame =
    df.select(col(idCol),
      array_join(array_distinct(split(col(textCol), "\n")), "\n").as(textCol))

  /**
   * Duplicated-substring span detection — the ExactSubstr shape of Lee
   * et al. 2021 ("Deduplicating Training Data Makes Language Models
   * Better"): a token k-gram occurring at least `minCount` times
   * ANYWHERE in the corpus (across documents or repeated within one)
   * marks its k-token window as duplicated, and per document the
   * overlapping/adjacent duplicated windows merge into maximal spans.
   * Output: (idCol, span_start, span_end) in 1-based inclusive token
   * coordinates (whitespace tokens of the lowercased text, matching
   * [[wordNgrams]]), one row per maximal span, the per-span complement
   * of the doc-level dedup family (MinHash/SimHash/Jaccard find
   * near-identical DOCUMENTS; this finds the duplicated REGIONS inside
   * otherwise-distinct documents — licence blurbs, quoted passages,
   * templated intros).
   *
   * Scale: the paper builds a single-node suffix array; the distributed
   * equivalent emits a slim (id, pos, 16-byte gram-key) row per token
   * window, runs a MAP-SIDE-COMBINED `groupBy` count of the keys — the
   * combined shuffle carries one row per distinct gram per map
   * partition, so a boilerplate gram duplicated 10^8 times corpus-wide
   * collapses to one row per mapper BEFORE the exchange and no hot-key
   * reducer straggler exists — then semi-joins the gram stream against
   * the (typically sparse) duplicated-key set and merges the surviving
   * hits into maximal spans with a per-document window (shuffling only
   * survivors). Rounds 2-6 used a whole-partition `count` window
   * instead (one shuffle of the FULL gram stream, no partial agg):
   * correct and spillable, but a window takes no map-side combine, so
   * the pathological gram shipped every occurrence to one reducer's
   * buffer — the round-6 audit flagged that straggler; this is the
   * two-pass variant it prescribed. The plan stays LAZY and
   * single-action: the gram kernel runs once per consumer (twice
   * total — a checkpointed reuse was measured at sf0.1 and the eager
   * materialization cost 1.5-3x more than the codegen'd re-scan it
   * saved), and AQE picks a broadcast for the key set when it is small
   * (the common case — then the gram stream is never shuffled at all)
   * or falls back to a skew-splittable shuffle join, options a window
   * exchange never has. Gram keys come from the codegen'd
   * [[TextOps.wordShinglePairs]] kernel — two independent 64-bit chains
   * per window, gram strings never materialized — so shuffle width is
   * constant and the collision bound is the same 128-bit birthday ≈
   * 2^64 distinct grams as the boilerplate line keys (SCALE.md). A gram
   * duplicated M times contributes M slim rows, never M² pairs; no
   * caps are needed and none are applied.
   */
  def duplicatedSpans(df: DataFrame, textCol: String, idCol: String,
                      k: Int, minCount: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "k must be >= 2")
    require(minCount >= 2, s"minCount must be >= 2 (got $minCount): " +
      "every window occurs at least once, so 1 would mark entire documents")
    val grams = df
      .select(col(idCol),
        posexplode(TextFunctions.word_shingle_pairs(col(textCol), lit(k)))
          .as(Seq("_off", "_hp")))
      .select(col(idCol), (col("_off") + 1).cast("long").as("pos"),
        col("_hp").getItem(0).as("_gh"), col("_hp").getItem(1).as("_gh2"))
    val dupKeys = grams.groupBy("_gh", "_gh2")
      .agg(count(lit(1)).as("_n")).filter(col("_n") >= minCount)
      .select("_gh", "_gh2")
    val hits = grams.join(dupKeys, Seq("_gh", "_gh2"), "left_semi")
    // Windows [p, p+k-1] and [q, q+k-1] (q > p) merge iff q <= p + k:
    // q = p + k is the touching case — contiguous duplicated text.
    val byPos = Window.partitionBy(col(idCol)).orderBy("pos")
    hits
      .withColumn("_brk",
        when(col("pos") - lag("pos", 1).over(byPos) <= k, 0).otherwise(1))
      .withColumn("_grp", sum("_brk").over(byPos))
      .groupBy(col(idCol), col("_grp"))
      .agg(min("pos").as("span_start"),
        (max("pos") + (k - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /**
   * Per-document duplicated-token accounting over [[duplicatedSpans]]:
   * (idCol, n_tokens, dup_tokens, dup_fraction) for EVERY input row
   * (0.0 where nothing is duplicated) — the filter/annotate metric a
   * pipeline thresholds on ("drop documents that are >50% duplicated
   * text"). Merged spans are disjoint by construction, so dup_tokens
   * is an exact cover count, never double-counted; n_tokens counts the
   * SAME tokens the span coordinates index (nonempty `\s+` tokens), so
   * dup_fraction = 1.0 means exactly "every token sits in a span".
   */
  def dupSpanFraction(df: DataFrame, textCol: String, idCol: String,
                      k: Int, minCount: Int = 2): DataFrame = {
    val perDoc = duplicatedSpans(df, textCol, idCol, k, minCount)
      .groupBy(col(idCol))
      .agg(sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
    df.select(col(idCol),
        size(wordTokens(col(textCol))).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn("dup_fraction",
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("dup_tokens").cast("double") / col("n_tokens")))
  }

  /**
   * The removal action over [[duplicatedSpans]] — what the ExactSubstr
   * pipeline actually does to the corpus (Lee et al. 2021): every token
   * covered by a duplicated span is cut, and the document is rebuilt
   * from the survivors. Output: (idCol, textCol, kept_tokens) for EVERY
   * input row. The rebuilt text is in normalized token form (lowercased,
   * single-space joined — the coordinate system the spans are computed
   * in); documents with nothing duplicated come back normalized but
   * otherwise intact, fully-duplicated documents come back as "" with
   * kept_tokens = 0 (a pipeline typically drops those). ONE pass of an
   * iterative process: cutting a span can make previously-separated
   * tokens adjacent and thereby mint new duplicated k-grams, so a
   * pipeline chasing a fixed point re-runs until [[duplicatedSpans]]
   * returns empty (ExactSubstr behaves the same way).
   *
   * Scale: the spans side collapses to ONE small row per affected doc
   * (array of merged [start, end] pairs — disjoint and few by
   * construction), joined back to the corpus on id; the cut itself is a
   * narrow projection (positional `filter` with an `exists` over the
   * span array — O(#spans) per token, codegen'd). No token-level
   * shuffle: the corpus stream is touched once and never exploded.
   */
  def removeDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
                            k: Int, minCount: Int = 2): DataFrame =
    cutSpans(df, duplicatedSpans(df, textCol, idCol, k, minCount),
      textCol, idCol)

  /** The cut half of [[removeDuplicatedSpans]], taking a PRECOMPUTED
    * (idCol, span_start, span_end) frame — so a caller that already has
    * the spans (the fixed-point loop's convergence check) never pays
    * the gram shuffle twice per round. */
  private[ext] def cutSpans(df: DataFrame, spans: DataFrame,
                            textCol: String, idCol: String): DataFrame = {
    val spansArr = spans
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("_spans"))
    val toks = wordTokens(col(textCol))
    val kept = filter(toks, (t, i) => !exists(col("_spans"), s =>
      i.cast("long") + 1L >= s.getField("span_start") &&
      i.cast("long") + 1L <= s.getField("span_end")))
    df.join(spansArr, Seq(idCol), "left")
      // one kept-array column, then two cheap consumers — keeps the
      // tokenize + cut work at once-per-row instead of once-per-output
      .withColumn("_kt", when(col("_spans").isNull, toks).otherwise(kept))
      .select(col(idCol), array_join(col("_kt"), " ").as(textCol),
        size(col("_kt")).cast("long").as("kept_tokens"))
  }

  /**
   * Per-group quota selection: keep the top `k` rows of each group by
   * (score desc, id asc) — the "cap every source/domain at its best k
   * documents" step of corpus mixing. The scale-critical choice: the
   * per-group top-k is the bounded [[TopKByScore]] heap aggregate
   * (map-side partial heaps, shuffle = k (id, score) pairs per group),
   * NOT `row_number().over(Window.partitionBy(...))` — the window
   * formulation shuffles and fully sorts EVERY row of every group. The
   * keeper id set then semi-joins the input (AQE broadcasts it when
   * #groups × k is small).
   */
  def quotaTopK(df: DataFrame, groupCol: String, score: Column,
                idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keep = df.select(col(groupCol).as("_g"), col(idCol).as("_id"),
        score.cast("double").as("_s"))
      .groupBy("_g")
      .agg(TopKAggregate.topk_by_score(col("_id"), col("_s"), k).as("_top"))
      .select(col("_g"), explode(col("_top")).as("_e"))
      .select(col("_g"), col("_e.id").as("_keep_id"))
    // semi-join on (group, id), not id alone: nothing in the API requires
    // idCol to be unique ACROSS groups, and an id kept in one group must
    // not smuggle in the same id's losing row of another group. <=> not
    // ===: a NULL group is a legitimate group (unknown provenance) and
    // its winners must survive the join like any other group's.
    df.join(keep,
      (df(groupCol) <=> keep("_g")) && df(idCol) === keep("_keep_id"),
      "left_semi")
  }

  /**
   * Sketch-based twin of the exact percentile corpus profile (the q90
   * cut): `approx_percentile` keeps a bounded quantile summary per group
   * (O(accuracy) memory, rank error <= 1/accuracy), where Spark's exact
   * `percentile` aggregate buffers per-distinct-value counts and grows
   * with group cardinality — harmless for small-int token lengths,
   * a real executor-memory hazard for high-cardinality metrics at
   * 100 TB. Prefer this variant for corpus profiling at scale.
   */
  def lengthPercentilesApprox(df: DataFrame, textCol: String,
                              groupCol: String,
                              accuracy: Int = 10000): DataFrame =
    df.select(col(groupCol),
        when(length(trim(col(textCol))) === 0, 0)
          .otherwise(tokenCount(col(textCol))).cast("double").as("_n"))
      .groupBy(col(groupCol))
      .agg(
        percentile_approx(col("_n"), lit(0.5), lit(accuracy)).as("p50_approx"),
        percentile_approx(col("_n"), lit(0.9), lit(accuracy)).as("p90_approx"))

  /**
   * Gopher repetition signals (Rae et al. 2021 §A1.1 — the public
   * repetition-filter family; [[qualityFlags]] covers the structural
   * half): for every document and every n in `ns`, the fraction of the
   * token stream's characters attributable to the single most frequent
   * word n-gram (`top_char_frac` — Gopher thresholds this for
   * n ∈ {2,3,4}) and to all duplicated n-grams together
   * (`dup_char_frac`, count ≥ 2 — Gopher thresholds this for
   * n ∈ {5..10}).
   *
   * Pinned definitions (mirrored by the q120 oracle): the token stream
   * is the space-joined lowercased whitespace tokens; a gram's
   * character mass is count × len(gram) where len includes the joining
   * spaces; overlapping occurrences double-count (as in the public
   * implementations of the rule) so both fractions clamp at 1.0.
   * `top_char_frac` maximizes the count×len product directly — no
   * tiebreak is needed over an argmax gram. Documents with fewer than
   * n tokens (or empty text) report 0.0.
   *
   * Scale: ZERO shuffle — repetition is a within-document statistic, so
   * the whole computation is the codegen'd one-pass
   * [[TextOps.ngramCharStats]] kernel (per-token hash + code-point
   * count, an in-kernel 64-bit-key count map, never a gram string) as a
   * narrow projection: one kernel call per (doc, n), exploded over the
   * tiny ns literal array. A first cut exploded (id, n, gram-string)
   * tuples through two aggregates and a join — ~50× slower at sf0.1 and
   * two shuffles of corpus-cardinality gram keys for a metric that
   * never needed to leave its row.
   */
  def ngramRepetition(df: DataFrame, textCol: String, idCol: String,
                      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must all be >= 1")
    require(ns.distinct.size == ns.size, "ns must be distinct")
    val stats = TextFunctions.ngram_char_stats(col(textCol), col("n"))
    df.select(col(idCol), col(textCol),
        explode(array(ns.map(n => lit(n)): _*)).as("n"))
      .select(col(idCol), col("n"), stats.as("_s"))
      .select(col(idCol), col("n"),
        when(element_at(col("_s"), 3) === 0L, lit(0.0))
          .otherwise(least(lit(1.0),
            element_at(col("_s"), 1).cast("double") /
              element_at(col("_s"), 3)))
          .as("top_char_frac"),
        when(element_at(col("_s"), 3) === 0L, lit(0.0))
          .otherwise(least(lit(1.0),
            element_at(col("_s"), 2).cast("double") /
              element_at(col("_s"), 3)))
          .as("dup_char_frac"))
  }

  /**
   * Temperature-scaled source mixing (the multilingual/source-balance
   * sampling rule of XLM-R / mT5: sample source i with probability
   * q_i ∝ n_i^alpha, alpha < 1 flattening the head so low-resource
   * sources are over-represented relative to their raw share). Given a
   * token budget `targetTokens`, each source's keep rate is
   * min(1, q_i·T / n_i) and every row gets a DETERMINISTIC
   * content-hash keep decision (first 6 md5 hex digits as a uniform
   * u ∈ [0,1), kept iff u < rate) — re-runs and engines agree, no RNG.
   *
   * alpha is fixed at 0.5 (√n mixing): IEEE-754 sqrt is exactly
   * rounded in every engine, so the rates — and therefore the keep
   * set — are reproducible bit-for-bit where a pow(n, alpha) would be
   * library-dependent in its last ulp.
   *
   * Scale: one map-side-combined per-source token aggregate (#sources
   * rows), broadcast back onto the corpus — no corpus shuffle at all;
   * the keep decision is a narrow codegen'd projection. Downsampling
   * only: a source whose fair share exceeds its size keeps everything
   * (rate clamps at 1) — epoch-replication upsampling is a separate
   * materialization concern.
   *
   * Output: every input row annotated (source, n_tokens, rate, kept) —
   * the audit frame; filter on `kept` for the mixed corpus.
   */
  def alphaSourceMix(df: DataFrame, textCol: String, idCol: String,
                     sourceCol: String, targetTokens: Long): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    // empty/whitespace-only docs are 0 tokens (the raw kernel's split
    // semantics would count 1 — same guard as tokenBudgetSelect and the
    // oracle's nonempty-token convention)
    val withTok = df.select(col(idCol), col(sourceCol),
      when(length(trim(col(textCol))) === 0, 0L)
        .otherwise(tokenCount(col(textCol)).cast("long")).as("n_tokens"),
      (conv(substring(md5(col(textCol)), 1, 6), 16, 10).cast("double") /
        lit((1L << 24).toDouble)).as("_u"))
    val perSource = withTok.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens")).as("_src_tokens"))
      .withColumn("_w", sqrt(col("_src_tokens").cast("double")))
    // #sources rows: the Σ√n denominator is computed once over the tiny
    // aggregate (deterministic ascending-source fold via a running
    // window ordered by source name, so the double addition order is
    // pinned and both engines sum identically), then broadcast.
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col(sourceCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val rated = perSource
      .withColumn("_wsum", sum(col("_w")).over(win))
      .withColumn("rate", least(lit(1.0),
        col("_w") / col("_wsum") * lit(targetTokens.toDouble) /
          col("_src_tokens")))
      .select(col(sourceCol), col("rate"))
    // null-safe equality: a NULL-source group exists in the aggregate
    // (missing provenance is a real corpus state), and a plain equi-join
    // would silently drop every one of its rows from the audit frame
    val r = rated.withColumnRenamed(sourceCol, "_rsrc")
    withTok.join(broadcast(r), col(sourceCol) <=> col("_rsrc"))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        round(col("rate"), 6).as("rate"),
        (col("_u") < col("rate")).as("kept"))
  }

  /**
   * Paragraph-level boilerplate removal — the CCNet line rule
   * ([[removeBoilerplateLines]]) lifted to paragraph granularity
   * (RefinedWeb drops repeated paragraphs — nav blocks, licence
   * blurbs — that line-level doc-frequency misses when the repeated
   * unit is a multi-line block whose individual lines are common).
   * Paragraphs are maximal runs split on blank lines (`\n{2,}` — a
   * line of only whitespace does NOT break a paragraph); a paragraph
   * appearing in more than `maxDocFreq` DISTINCT documents is dropped
   * from every document; survivors rejoin in order with "\n\n" (the
   * canonical separator — original blank-run widths are not
   * preserved). Same scale shape as the line rule: slim 128-bit
   * two-hash paragraph keys through one distinct + one doc-frequency
   * aggregate, anti-join, order-preserving reassembly; all-boilerplate
   * docs survive as empty text.
   */
  def removeBoilerplateParagraphs(df: DataFrame, textCol: String,
                                  idCol: String,
                                  maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, "maxDocFreq must be >= 1")
    val paras = df.select(col(idCol),
      posexplode(split(col(textCol), "\n{2,}")).as(Seq("pos", "para")))
    val hashed = paras
      .withColumn("_ph", xxhash64(col("para")))
      .withColumn("_ph2", xxhash64(lit(0x9E3779B97F4A7C15L), col("para")))
    val boiler = hashed.select(col(idCol), col("_ph"), col("_ph2")).distinct()
      .groupBy("_ph", "_ph2").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxDocFreq)
      .select("_ph", "_ph2")
    val kept = hashed.join(boiler, Seq("_ph", "_ph2"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          s => s.getField("para")), "\n\n").as(textCol))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  /**
   * Epoch-replication upsampling — the materialization half of source
   * mixing ([[alphaSourceMix]] is the downsampling half): each source
   * gets a replication factor `epochs(source)` ≥ 0 (the per-source
   * epoch counts of the public LLaMA/GPT-3 mixture tables — e.g.
   * Wikipedia 2.45 epochs, CommonCrawl 0.67), and every row is emitted
   * ⌊e⌋ times plus one more iff its deterministic content-hash
   * u ∈ [0,1) (first 6 md5 hex digits) is < frac(e) — so the EXPECTED
   * per-source token multiple is exactly e, re-runs are identical, and
   * e < 1 degrades to plain hash downsampling. A source absent from
   * `epochs` defaults to 1.0 (pass through unchanged).
   *
   * Output: the input row plus `copy` (1..copies) — downstream packing
   * sees each replica as its own document; rows with copies = 0 vanish.
   *
   * Scale: a narrow codegen'd projection + explode — no shuffle, no
   * join, no driver state; the epochs map ships as a literal CASE
   * chain (mixture tables are O(10) sources).
   */
  def epochUpsample(df: DataFrame, textCol: String, idCol: String,
                    sourceCol: String,
                    epochs: Map[String, Double]): DataFrame = {
    require(epochs.values.forall(e => e >= 0.0 && e <= 1000.0),
      "epochs must be in [0, 1000]")
    val e = epochs.foldLeft(lit(1.0)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val u = conv(substring(md5(col(textCol)), 1, 6), 16, 10).cast("double") /
      lit((1L << 24).toDouble)
    val copies = (floor(e).cast("int") +
      when(u < (e - floor(e)), 1).otherwise(0)).as("_copies")
    df.withColumn("_copies", copies)
      .withColumn("copy",
        explode(when(col("_copies") >= 1,
          sequence(lit(1), col("_copies")))
          .otherwise(array().cast("array<int>"))))
      .drop("_copies")
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al. 2019): per
   * language, rank documents by a per-doc LM score and split them into
   * equal thirds — `head` (most fluent), `middle`, `tail`. Takes ANY
   * per-doc score frame (id, lang, score) so it composes with
   * [[bigramSelfEntropy]], [[bigramEntropyUnderModel]], or an external
   * LM's scores; NULL scores (token-free docs) bucket as `unscored`
   * instead of polluting the terciles.
   *
   * Buckets are assigned by RANK (`ntile(3)` over (score ASC, id ASC)
   * per language — both break ties and distribute the n%3 remainders
   * per the SQL standard), never by comparing floats to an interpolated
   * percentile value — so the split is reproducible across engines and
   * runs even when scores tie after rounding.
   *
   * Scale: ntile needs a full per-language sort (CCNet's own recipe —
   * it ranks each language globally); one range-partitioned sort
   * shuffle of a slim (id, lang, score) frame. For corpora where even
   * that is too hot, compute approx tercile THRESHOLDS with
   * `percentile_approx` + broadcast and accept boundary fuzz — the
   * exact-rank form is the gate-checked reference semantics.
   */
  def perplexityBuckets(df: DataFrame, scoreCol: String, idCol: String,
                        langCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val scored = df.filter(col(scoreCol).isNotNull)
      .withColumn("_t", ntile(3).over(w))
      .select(col(idCol), col(langCol), col(scoreCol),
        when(col("_t") === 1, "head").when(col("_t") === 2, "middle")
          .otherwise("tail").as("bucket"))
    scored.unionByName(
      df.filter(col(scoreCol).isNull)
        .select(col(idCol), col(langCol), col(scoreCol),
          lit("unscored").as("bucket")))
  }

  /**
   * The remaining Gopher STRUCTURAL quality rules (Rae et al. 2021
   * §A1.1 — [[qualityFlags]] covers length/word-length/punctuation/
   * dup-lines and [[ngramRepetition]] the repetition half): per-doc
   * signals plus the composite keep verdict at the paper's thresholds.
   *
   * Pinned definitions (mirrored by the q125 oracle):
   *  - `symbol_ratio` — (count('#') + count('…') + count of
   *    non-overlapping '...') / word count; ≤ 0.1 to keep.
   *  - `bullet_line_frac` — fraction of '\n'-lines whose first
   *    non-space char is '•', '-' or '*'; ≤ 0.9.
   *  - `ellipsis_line_frac` — fraction of lines whose right-trimmed
   *    form ends in '...' or '…'; ≤ 0.3.
   *  - `alpha_word_frac` — fraction of (lowercased whitespace) words
   *    containing an ASCII letter; ≥ 0.8. ASCII is pinned because
   *    Unicode letter classes differ across engines.
   *  - `n_stopwords` — DISTINCT members of the paper's 8-word stop
   *    list {the, be, to, of, and, that, have, with} present as
   *    tokens; ≥ 2.
   * Zero-word and zero-line docs report 0.0 ratios (and fail the
   * alpha/stopword minimums — Gopher drops empty docs).
   *
   * Scale: one narrow codegen'd projection — split/filter/intersect
   * over per-row arrays, no shuffle, no UDFs.
   */
  def gopherStructuralFlags(df: DataFrame, textCol: String, idCol: String,
                            maxSymbolRatio: Double = 0.1,
                            maxBulletFrac: Double = 0.9,
                            maxEllipsisFrac: Double = 0.3,
                            minAlphaFrac: Double = 0.8,
                            minStopwords: Int = 2): DataFrame = {
    val t = col(textCol)
    val toks = wordTokens(t)
    val nw = size(toks)
    def occurrences(needle: String): Column =
      length(t) - length(replace(t, lit(needle), lit("")))
    val symbols = occurrences("#") + occurrences("…") +
      occurrences("...") / lit(3)
    val symbolRatio =
      when(nw === 0, 0.0).otherwise(symbols.cast("double") / nw)
    val lines = split(t, "\n")
    val nl = size(lines)
    val bullets = size(filter(lines,
      l => substring(ltrim(l), 1, 1).isin("•", "-", "*")))
    val bulletFrac = when(nl === 0, 0.0).otherwise(bullets.cast("double") / nl)
    val ellipses = size(filter(lines,
      l => endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
    val ellipsisFrac =
      when(nl === 0, 0.0).otherwise(ellipses.cast("double") / nl)
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]")))
    val alphaFrac = when(nw === 0, 0.0).otherwise(alphaWords.cast("double") / nw)
    val stopwords = size(array_intersect(array_distinct(toks),
      array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
        .map(lit): _*)))
    df.select(col(idCol),
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      alphaFrac.as("alpha_word_frac"),
      stopwords.as("n_stopwords"),
      (symbolRatio <= maxSymbolRatio && bulletFrac <= maxBulletFrac &&
        ellipsisFrac <= maxEllipsisFrac && alphaFrac >= minAlphaFrac &&
        stopwords >= minStopwords).as("keep"))
  }

  /**
   * HTML/markup stripping — the text-extraction step in front of a
   * web-corpus cleaning pipeline (the trafilatura/jusText problem
   * reduced to its deterministic core): drops comments, `<script>`/
   * `<style>` elements WITH their contents, then all remaining tags;
   * unescapes the five XML entities plus `&nbsp;` (amp LAST, the
   * standard single-pass order, so `&amp;lt;` yields the literal
   * string `&lt;`, not a tag-char); collapses space/tab runs and
   * 3+-newline runs. The chain is pinned — same regexes, same order —
   * and RE2-compatible so the oracle replays it verbatim.
   *
   * Scale: a zero-shuffle narrow projection of codegen'd
   * `regexp_replace`s. NULL text passes through as NULL.
   */
  def stripMarkup(text: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "(?s)<!--.*?-->" -> "",
      "(?is)<script\\b[^>]*>.*?</script>" -> "",
      "(?is)<style\\b[^>]*>.*?</style>" -> "",
      "(?s)<[^>]+>" -> " ",
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&",
      "[ \\t]+" -> " ",
      " ?\\n ?" -> "\n",
      "\\n{3,}" -> "\n\n")
    trim(steps.foldLeft(text) { case (c, (p, r)) =>
      regexp_replace(c, p, r) })
  }

  /** [[stripMarkup]] over a frame, rebuilt in place. */
  def stripMarkupDocs(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, stripMarkup(col(textCol)))

  /**
   * Unicode text normalization — the fix-encoding stage every web-crawl
   * pipeline runs before hashing or tokenizing (CCNet normalizes before
   * dedup hashing for exactly this reason): the SAME visible text must
   * produce the SAME bytes, or exact/line/span dedup silently misses
   * `Caf\u00E9` vs `Cafe\u0301` (composed vs combining-mark) and
   * `A B` vs `A\u00A0B` (NBSP) twins. A PINNED chain, applied in order:
   *   1. strip C0 controls except \t \n \r, DEL, and the zero-width
   *      marks ZWSP U+200B / BOM U+FEFF;
   *   2. NFC canonical composition ([[TextFunctions.nfc_normalize]],
   *      codegen'd JDK Normalizer --- UAX #15, identity on ASCII);
   *   3. line endings: \r\n and bare \r to \n;
   *   4. no-break spaces (U+00A0, U+2007, U+202F) to plain space;
   *   5. runs of spaces/tabs to one space;
   *   6. trim.
   * Order matters: the zero-width strip runs BEFORE NFC --- a ZWSP/BOM
   * sitting between a base char and its combining mark BLOCKS
   * composition, so strip-then-compose is what makes `Cafe\u200B\u0301`
   * collapse with `Caf\u00E9` (the NFC-first order left it decomposed
   * AND broke idempotence: pass 2 composed what pass 1 could not);
   * NBSP becomes a space BEFORE the run-collapse. Re-pin the oracle if
   * any step moves. Idempotent: a second pass is the identity (the
   * strip and NFC are both no-ops on their own output).
   * Scale: one narrow codegen'd projection per row, no shuffle; the
   * NFC step allocates only for non-ASCII non-NFC rows (rare in web
   * text), the regexp steps are the same per-row cost as [[stripMarkup]].
   */
  def normalizeText(text: Column): Column = {
    val n0 = regexp_replace(text,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u200B\\uFEFF]", "")
    val n1 = nfc_normalize(n0)
    val n2 = regexp_replace(n1, "\\r\\n?", "\n")
    val n3 = regexp_replace(n2, "[\\u00A0\\u2007\\u202F]", " ")
    val n4 = regexp_replace(n3, "[ \\t]+", " ")
    trim(n4)
  }

  /** [[normalizeText]] over a frame: text rebuilt in place plus a
    * `changed` flag (cheap provenance: how much of the corpus was
    * byte-shifted by normalization is a standard pipeline health stat). */
  def normalizeDocs(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_norm", normalizeText(col(textCol)))
      .withColumn("changed", !(col("_norm") <=> col(textCol)))
      .withColumn(textCol, col("_norm")).drop("_norm")

  /**
   * Deterministic train/val/test corpus split: each document's
   * content-hash draw u ∈ [0,1) (first 6 md5 hex digits) lands in the
   * half-open interval of the cumulative `weights` (ordered as given,
   * which must sum to 1 ± 1e-9). Content-keyed on purpose: EXACT
   * duplicates always land in the same split, so a later exact dedup
   * can't create train/test leakage — near-duplicates still need
   * dedup BEFORE splitting. Re-runs, engines, and row order all agree;
   * zero shuffle, one narrow projection.
   */
  def splitCorpus(df: DataFrame, textCol: String,
                  weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "weights must sum to 1")
    val u = conv(substring(md5(col(textCol)), 1, 6), 16, 10).cast("double") /
      lit((1L << 24).toDouble)
    // fold cumulative bounds left-to-right (the oracle mirrors the same
    // double additions); the last label is the unconditional else so
    // float dust at the top boundary can't drop a row
    val bounds = weights.init.scanLeft(0.0) { case (c, (_, w)) => c + w }.tail
    val split = weights.init.zip(bounds).reverse
      .foldLeft(lit(weights.last._1): Column) { case (acc, ((l, _), b)) =>
        when(u < b, l).otherwise(acc)
      }
    df.withColumn("split", split)
  }

  /** Slim (id, bucket) hashed-ngram feature stream shared by the DSIR
    * pair: word unigrams + space-joined bigrams, md5-24-bit-prefix
    * bucketed (the engine-portable hash every deterministic draw in
    * this file uses) — one narrow explode per doc, int rows only. */
  private def hashedGramBuckets(df: DataFrame, textCol: String,
                                idExpr: Column, buckets: Int): DataFrame =
    // ONE explode of the concatenated uni+bigram array (the exact
    // list_concat shape the q131 oracle uses). Tokenize ONCE into `w`
    // and build bigrams with element_at + concat — the
    // `wordNgrams(text, 2)` composition re-tokenizes and allocates a
    // slice + array_join per gram, measured 8x slower on this stream
    // (6.5 s vs 0.6 s at sf0.1); output strings are identical
    df.select(idExpr.as("id"), wordTokens(col(textCol)).as("w"))
      .select(col("id"), explode(concat(col("w"),
        when(size(col("w")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(0), size(col("w")) - 2),
            i => concat(element_at(col("w"), i + 1), lit(" "),
              element_at(col("w"), i + 2)))))).as("g"))
      .select(col("id"), (conv(substring(md5(col("g")), 1, 6), 16, 10)
        .cast("long") % buckets).cast("int").as("b"))

  /**
   * DSIR importance log-weights (Xie et al., NeurIPS 2023 — "Data
   * Selection for Language Models via Importance Resampling", a public
   * paper; the data-selection method behind several open LLM corpora):
   * featurize documents as bags of hashed word uni+bigrams over
   * `buckets` buckets, fit Laplace-smoothed categorical distributions
   * p-hat over the TARGET corpus (the domain you want more of — a wiki
   * or benchmark sample) and q-hat over the raw corpus itself, and
   * score every raw document with
   *   logw(d) = SUM_g [ln p-hat(h(g)) - ln q-hat(h(g))]
   *           = SUM_g [ln(ct_b + a) - ln(T + aB) - ln(cq_b + a) + ln(Q + aB)].
   * Output: (idCol, n_grams, dsir_logw 6 dp); a doc with NO grams
   * (empty/whitespace text) is pinned to n_grams = 0, logw = 0.0 — no
   * evidence is neutral, not a rejection.
   *
   * Scale: the gram stream is slim (id, int-bucket) rows; both
   * distributions aggregate map-side to <= `buckets` rows and the
   * log-ratio table BROADCASTS into the scoring join, so the corpus
   * never shuffles — two narrow corpus scans (the gram stream feeds
   * the q-hat agg and the scoring join; the bm25Scores stats shape)
   * plus one partial-agg groupBy(id) of per-doc weight sums. The
   * target side is small by construction and aggregates the same way.
   */
  def dsirLogWeights(corpus: DataFrame, textCol: String, idCol: String,
                     target: DataFrame, targetTextCol: String,
                     buckets: Int = 8192, alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 24),
      s"buckets must be in [1, 2^24] (md5 prefix width), got $buckets")
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    // the corpus gram stream feeds BOTH the q-hat aggregate and the
    // scoring join; checkpoint the slim (id, int-bucket) rows once so
    // tokenize + ngram + md5 run one corpus pass, not two (measured
    // 11.9 s -> 4 s at sf0.1; the duplicatedSpans two-pass precedent)
    val cb = hashedGramBuckets(corpus, textCol, col(idCol), buckets)
      .lineageCut()
    val tb = hashedGramBuckets(target, targetTextCol, lit(0L), buckets)
    val qd = cb.groupBy("b").agg(count(lit(1)).cast("double").as("cq"))
    val pd = tb.groupBy("b").agg(count(lit(1)).cast("double").as("ct"))
    val qTot = qd.agg(sum(col("cq")).as("qq"))
    // empty target: T = 0 makes every bucket's p-hat the uniform a/(aB)
    // — weights become -ln(cq+a)+ln(Q+aB)+ln(a)-ln(aB), a pure
    // inverse-frequency score; legal, and pinned by the spec
    val pTot = pd.agg(coalesce(sum(col("ct")), lit(0.0)).as("tt"))
    val aB = lit(alpha * buckets)
    val lr = qd.join(pd, Seq("b"), "left")
      .crossJoin(broadcast(qTot)).crossJoin(broadcast(pTot))
      .select(col("b"),
        (log(coalesce(col("ct"), lit(0.0)) + alpha) - log(col("tt") + aB) -
         log(col("cq") + alpha) + log(col("qq") + aB)).as("lw"))
    val dw = cb.join(broadcast(lr), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), round(sum(col("lw")), 6).as("dsir_logw"))
      .withColumnRenamed("id", "_gid")
    corpus.select(col(idCol))
      .join(dw, col(idCol) === col("_gid"), "left")
      .select(col(idCol), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"))
  }

  /**
   * DSIR Gumbel-top-k resampling over [[dsirLogWeights]]: sampling k
   * docs WITHOUT replacement proportional to exp(logw) is exactly
   * "rank by logw + Gumbel(0,1) noise, take the top k" (the Gumbel
   * top-k trick the paper uses). The noise is DETERMINISTIC: u =
   * (md5("dsir:" || text) 24-bit prefix + 0.5) / 2^24 in (0,1) — the
   * "dsir:" salt decorrelates this draw from the split/mix/upsample
   * draws that key on the same content hash — and g = -ln(-ln(u)).
   * Both logw and g are 6 dp-rounded BEFORE the sum so the ranking key
   * is the same double in any engine; ties break id-asc. Returns the
   * k selected rows (id, n_grams, dsir_logw, gumbel_key).
   *
   * Scale: the keyed frame is one narrow projection over the weights
   * output; selection is `orderBy.limit(k)` = TakeOrderedAndProject —
   * bounded per-partition heaps, never a global sort.
   */
  def dsirResample(corpus: DataFrame, textCol: String, idCol: String,
                   target: DataFrame, targetTextCol: String, k: Int,
                   buckets: Int = 8192, alpha: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = dsirLogWeights(corpus, textCol, idCol, target, targetTextCol,
      buckets, alpha)
    val u = (conv(substring(md5(concat(lit("dsir:"), col(textCol))), 1, 6),
      16, 10).cast("double") + 0.5) / lit((1L << 24).toDouble)
    val keyed = corpus.select(col(idCol), round(-log(-log(u)), 6).as("_g"))
      .join(w, Seq(idCol))
      .withColumn("gumbel_key", col("dsir_logw") + col("_g"))
    keyed.orderBy(col("gumbel_key").desc, col(idCol).asc).limit(k)
      .select(col(idCol), col("n_grams"), col("dsir_logw"),
        round(col("gumbel_key"), 6).as("gumbel_key"))
  }

  /**
   * Linear quality-classifier scoring — the fastText-style "looks like
   * curated text" filter of GPT-3's Common Crawl pipeline (Brown 2020
   * §A) and CCNet: a LOGISTIC model sigmoid(w·x + b) over the pinned
   * deterministic feature vector
   *   x = [stopword_ratio, punct_ratio, digit_ratio, upper_ratio,
   *        mean_word_len/10, ln(1 + n_tokens)/10].
   * The engine contract is the featurization + scoring plan; `weights`
   * / `bias` are the caller's trained artifact (the external-model
   * shape of [[bigramEntropyUnderModel]]) — the defaults are hand-set
   * to prefer prose (stopword-rich, lightly punctuated, low-digit,
   * low-caps). Output (id, quality 6 dp, keep = quality >= threshold).
   * Zero shuffle: one codegen'd projection per row; the weighted sum
   * folds left-to-right (w0·x0 + … + w5·x5 + b) and the oracle must
   * replay that exact association order.
   */
  /** The 6 features of [[linearQualityScore]]/[[trainQualityClassifier]],
    * in the pinned order the weight vector is documented against. */
  private def qualityFeatures(t: Column): Seq[Column] = {
    val nTok = when(length(trim(t)) === 0, 0).otherwise(token_count(t))
      .cast("double")
    Seq(stopwordRatio(t), punctRatio(t), digitRatio(t), upperRatio(t),
      meanWordLength(t) / 10.0, log(lit(1.0) + nTok) / 10.0)
  }

  /**
   * TRAIN the linear quality classifier — full-batch logistic
   * regression by gradient descent over [[linearQualityScore]]'s six
   * features + bias, from labeled documents (fastText-style quality
   * labels: curated-vs-crawl). Deterministic and ORACLE-REPLAYABLE by
   * construction: weights start at zero, every gradient component
   * accumulates per-row double terms in DECIMAL(38,18) (exact,
   * order-independent — a plain double sum would differ run to run
   * with partition order), and the update is w := w - lr * g / n with
   * the stated association. Returns one row per weight:
   * (term ∈ {w0_stopword … w5_lntok, w6_bias}, weight rounded 6 dp).
   * Compose with [[linearQualityScore]] (same feature order) to score.
   *
   * Scale: each iteration is ONE map-side-combined aggregate over the
   * slim checkpointed (y, f0..f5) frame — 7 decimal sums shuffle one
   * partial row per partition; the driver holds 7 doubles. iters
   * iterations = iters scans of the slim frame, never of raw text
   * (features are computed once). Full-batch GD on 10^10 docs is iters
   * passes of a 7-column aggregate — or sample the frame first; the
   * math is unchanged.
   */
  def trainQualityClassifier(df: DataFrame, textCol: String, idCol: String,
                             labelCol: String, lr: Double = 0.5,
                             iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 1000, s"iters in [1, 1000], got $iters")
    val feats = qualityFeatures(col(textCol))
    // null text/label rows are excluded BEFORE n is counted: a NULL row
    // evaluates to NULL gradient terms that sum() skips, so counting it
    // in n would silently shrink every update (and an all-null frame
    // would NPE on the null sums instead of failing loudly here)
    val base = df.filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(
        (col(labelCol).cast("double").as("_y") +:
          feats.zipWithIndex.map { case (f, i) => f.as(s"_f$i") }): _*)
      .lineageCut()
    val n = base.count()
    require(n > 0, "empty training frame (after dropping null text/label rows)")
    var w = Array.fill(7)(0.0)
    for (_ <- 1 to iters) {
      val z = (0 until 6).map(i => col(s"_f$i") * lit(w(i)))
        .reduce(_ + _) + lit(w(6))
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - col("_y")
      val gCols = (0 until 6).map(i =>
        sum((err * col(s"_f$i")).cast("decimal(38,18)")).as(s"_g$i")) :+
        sum(err.cast("decimal(38,18)")).as("_g6")
      val r = base.agg(gCols.head, gCols.tail: _*).head()
      w = Array.tabulate(7)(j =>
        w(j) - lr * r.getDecimal(j).doubleValue() / n)
    }
    val names = Seq("w0_stopword", "w1_punct", "w2_digit", "w3_upper",
      "w4_mwl", "w5_lntok", "w6_bias")
    val spark = df.sparkSession
    import spark.implicits._
    // Catalyst round(), not scala math: its HALF_UP ties match DuckDB's
    // round() — the cross-engine rounding convention every gate uses
    names.zip(w.toSeq).toDF("term", "_w")
      .select(col("term"), round(col("_w"), 6).as("weight"))
  }

  def linearQualityScore(df: DataFrame, textCol: String, idCol: String,
                         weights: Seq[Double] =
                           Seq(3.0, -8.0, -4.0, -2.0, 1.0, 1.0),
                         bias: Double = -0.5,
                         threshold: Double = 0.5): DataFrame = {
    require(weights.length == 6,
      s"6 feature weights expected (stopword, punct, digit, upper, " +
        s"mwl/10, ln-tokens/10), got ${weights.length}")
    val feats = qualityFeatures(col(textCol))
    val z = feats.zip(weights).map { case (f, w) => f * lit(w) }
      .reduce(_ + _) + lit(bias)
    df.select(col(idCol),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality"))
      .withColumn("keep", col("quality") >= threshold)
  }

  /**
   * BPE merge-candidate table — the distributed piece of byte-pair-
   * encoding tokenizer training (Sennrich et al. 2016, "Neural Machine
   * Translation of Rare Words with Subword Units"): count adjacent
   * within-word symbol pairs across the corpus and rank the top-k
   * merge candidates — the argmax table the first BPE merge consumes
   * (iterated merging re-pairs the VOCAB, a small driver loop out of
   * scope here; the corpus-scale work is this table).
   *
   * Computed the way a 100 TB run must: corpus → (word, count) vocab
   * FIRST (one map-side-combined agg of slim word rows — Zipf's law
   * makes the vocab orders of magnitude smaller than the corpus), then
   * the pair explode runs over DISTINCT words weighted by count, never
   * over every word instance. Output (pair, n, rank): pair is the BPE
   * convention "a b" space-joined form, ranked (n desc, pair asc) via
   * a bounded TakeOrdered head. Symbols are UTF-16 code units (=
   * code points on the BMP, where DuckDB's character indexing agrees;
   * astral-plane text would pair surrogate halves — the classic
   * byte/char-level BPE ambiguity, pinned here to the JVM convention).
   */
  def bpeMergeCandidates(df: DataFrame, textCol: String,
                         k: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val vocab = df.select(explode(wordTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val chars = split(col("w"), "")
    val pairs = vocab
      .filter(length(col("w")) >= 2)
      .select(col("wc"), explode(zip_with(
        slice(chars, lit(1), size(chars) - 1),
        slice(chars, lit(2), size(chars) - 1),
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").agg(sum(col("wc")).as("n"))
    // rank window runs on the <= k TakeOrdered head, not the pair table
    pairs.orderBy(col("n").desc, col("pair").asc).limit(k)
      .select(col("pair"), col("n"), row_number().over(
        Window.orderBy(col("n").desc, col("pair").asc)).cast("int").as("rank"))
  }

  /**
   * Iterated BPE merge training (Sennrich et al. 2016, Algorithm 1 —
   * the merge LOOP whose single round is [[bpeMergeCandidates]]):
   * `rounds` times, count adjacent within-word symbol pairs over the
   * (word, count) vocab weighted by word count, take the argmax pair
   * (ties broken by the space-joined pair string ascending — binary
   * collation on both engines), and re-segment the vocab by merging
   * that pair's occurrences LEFTMOST-FIRST non-overlapping (the
   * reference implementation's convention: "aaa" under merge (a,a)
   * becomes [aa, a], and a just-merged symbol never re-merges in the
   * same round). Returns the merge table (round, pair, n) — the
   * ordered merge list IS the trained tokenizer artifact. Stops early
   * if the vocab runs out of adjacent pairs before `rounds`.
   *
   * Scale: the corpus is scanned ONCE (the word-count aggregate);
   * the merge loop then runs over the DISTINCT-word vocab — orders of
   * magnitude smaller by Zipf. When the vocab fits `maxLocalVocab`
   * (the common case: even web-scale corpora have vocabularies the
   * driver holds comfortably, and a real tokenizer needs 30k–50k
   * rounds) it is COLLECTED ONCE and every round is an in-memory
   * count/argmax/re-segment — no per-round jobs at all. Otherwise the
   * per-round distributed loop runs (bounded TakeOrdered argmax, one
   * slim driver row per round, codegen'd fold re-segment, per-round
   * `localCheckpoint` truncating lineage) behind a loud warning naming
   * the sizes and the knob.
   */
  /** Spark's string ordering is UNSIGNED UTF-8 BYTE comparison
    * (UTF8String.compareTo); Java's String.compareTo is UTF-16-unit
    * order, which DISAGREES above the BMP (surrogates sort below
    * U+E000..U+FFFF chars). The local merge loop must break count ties
    * exactly as the distributed `orderBy(pair asc)` would. */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** The local twin of the distributed fold re-segment: leftmost-first
    * non-overlapping merge of adjacent (a, b) — compare the ACCUMULATED
    * last symbol to `a`, so a just-written `a+b` never chain-merges
    * within the round. */
  private def mergeWordLocal(syms: Array[String], a: String, b: String,
                             ab: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    out += syms(0)
    var i = 1
    while (i < syms.length) {
      if (out(out.length - 1) == a && syms(i) == b) out(out.length - 1) = ab
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Driver-local merge loop over a collected vocab (Sennrich's own
    * reference shape): per round one in-memory pair count + argmax +
    * re-segment — microseconds-to-milliseconds where the distributed
    * round costs a Spark job launch + checkpoint. Semantics pinned to
    * the distributed loop (same argmax tie order via [[utf8Less]], same
    * leftmost fold) — an ExtSpec asserts the two paths are identical. */
  private def bpeTrainLocal(words: Array[(String, Array[String], Long)],
                            rounds: Int): Seq[(Int, String, Long)] = {
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      words.foreach { case (_, syms, wc) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), wc,
            (x, y) => java.lang.Long.valueOf(x + y))
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestA: String = null; var bestB: String = null
        var bestPair: String = null; var bestN = Long.MinValue
        counts.forEach { (k, v) =>
          val pair = k._1 + " " + k._2
          if (v > bestN || (v == bestN && utf8Less(pair, bestPair))) {
            bestA = k._1; bestB = k._2; bestPair = pair; bestN = v
          }
        }
        merges += ((r, bestPair, bestN))
        val ab = bestA + bestB
        var i = 0
        while (i < words.length) {
          val (w, syms, wc) = words(i)
          // cheap containment pre-check before the rebuild
          var j = 0; var hit = false
          while (j < syms.length - 1 && !hit) {
            hit = syms(j) == bestA && syms(j + 1) == bestB; j += 1
          }
          if (hit) words(i) = (w, mergeWordLocal(syms, bestA, bestB, ab), wc)
          i += 1
        }
        r += 1
      }
    }
    merges.result()
  }

  /** The train loop shared by [[bpeTrainMerges]] and
    * [[bpeSegmentCounts]]: returns (merge list, final per-word subword
    * counts (w, _ns) under the trained segmentation).
    *
    * The vocab (distinct words — Zipf-small relative to the corpus) is
    * COLLECTED and the merge loop runs driver-local when it fits under
    * `maxLocalVocab`: a real tokenizer is 30k–50k merge rounds, and one
    * Spark job + localCheckpoint per round would be hours of launch
    * overhead for work a driver does in seconds. Vocabularies that
    * genuinely don't fit fall back to the distributed per-round loop
    * with a LOUD warning naming both the sizes and this knob. The
    * corpus-scale piece — the one word-count aggregate — is identical
    * either way, and so is every merge: the local loop pins the
    * distributed argmax tie order ([[utf8Less]]) and fold re-segment. */
  private def bpeTrainLoop(df: DataFrame, textCol: String, rounds: Int,
                           maxLocalVocab: Int)
      : (Seq[(Int, String, Long)], DataFrame) = {
    require(rounds >= 1 && rounds <= 100000, s"rounds in [1, 100000], got $rounds")
    require(maxLocalVocab >= 0, s"maxLocalVocab must be >= 0, got $maxLocalVocab")
    val spark = df.sparkSession
    val vocab0 = df.select(explode(wordTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(col("w"), split(col("w"), "").as("syms"), col("wc"))
    // bounded probe-collect: at most maxLocalVocab+1 rows ever reach the
    // driver, and the +1 row is exactly the overflow signal
    val head =
      if (maxLocalVocab == 0) Array.empty[org.apache.spark.sql.Row]
      else vocab0.limit(maxLocalVocab + 1).collect()
    if (head.nonEmpty && head.length <= maxLocalVocab) {
      import spark.implicits._
      val words = head.map(r =>
        (r.getString(0), r.getSeq[String](1).toArray, r.getLong(2)))
      val merges = bpeTrainLocal(words, rounds)
      val seg = words.toSeq.map { case (w, syms, _) => (w, syms.length.toLong) }
        .toDF("w", "_ns")
      return (merges, seg)
    }
    if (maxLocalVocab > 0)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"bpeTrainLoop: vocab exceeds maxLocalVocab=$maxLocalVocab distinct " +
        s"words - falling back to the DISTRIBUTED per-round merge loop " +
        s"(one Spark job per round; at ${rounds} rounds expect launch " +
        s"overhead to dominate). Raise maxLocalVocab if the driver can " +
        s"hold the vocab.")
    var vocab = vocab0.lineageCut()
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("wc"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p").getField("a").as("a"), col("p").getField("b").as("b"))
        .agg(sum(col("wc")).as("n"))
        .withColumn("pair", concat(col("a"), lit(" "), col("b")))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getAs[String]("a")
        val b = top(0).getAs[String]("b")
        merges += ((r, a + " " + b, top(0).getAs[Long]("n")))
        // greedy leftmost fold: compare the ACCUMULATED last symbol to
        // `a` — a symbol just written by a merge is `a+b`, which never
        // equals `a`, so merged output can't chain-merge within a round
        vocab = vocab.select(col("w"),
          when(size(col("syms")) < 2, col("syms")).otherwise(
            aggregate(slice(col("syms"), lit(2), size(col("syms")) - 1),
              slice(col("syms"), lit(1), lit(1)),
              (acc, x) => when(
                element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                .otherwise(concat(acc, array(x))))).as("syms"),
          col("wc"))
          .lineageCut()
        r += 1
      }
    }
    (merges.result(),
      vocab.select(col("w"), size(col("syms")).cast("long").as("_ns")))
  }

  def bpeTrainMerges(df: DataFrame, textCol: String, rounds: Int,
                     maxLocalVocab: Int = 1000000): DataFrame = {
    val spark = df.sparkSession
    val (merges, _) = bpeTrainLoop(df, textCol, rounds, maxLocalVocab)
    import spark.implicits._
    merges.toDF("round", "pair", "n")
  }

  /**
   * Train `rounds` BPE merges ([[bpeTrainMerges]]) and ENCODE the
   * corpus with the trained tokenizer: per-document subword count
   * under the final segmentation — the number a token-budget planner
   * actually needs (whitespace token counts under-estimate cost for
   * morphology-heavy text; a trained subword count is the real
   * sequence length). Documents with no tokens report 0.
   *
   * Scale: the encode never re-segments per occurrence — the corpus's
   * exploded words join the DISTINCT-word vocab (Zipf-small relative
   * to the corpus) on the slim (word, subword-count) projection and
   * aggregate per doc; AQE broadcasts the vocab side when it fits and
   * falls back to a shuffle join on the slim key when a web-scale
   * vocab (1e8+ distinct words) outgrows broadcast range — no hint is
   * pinned, deliberately.
   */
  def bpeSegmentCounts(df: DataFrame, textCol: String, idCol: String,
                       rounds: Int, maxLocalVocab: Int = 1000000): DataFrame = {
    val (_, seg) = bpeTrainLoop(df, textCol, rounds, maxLocalVocab)
    df.select(col(idCol), explode_outer(wordTokens(col(textCol))).as("w"))
      .join(seg, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("_ns")), lit(0L)).as("n_subwords"))
  }

  // ---- Unigram-LM (SentencePiece) tokenizer training ----------------------

  /** logp values are pinned to SIX DECIMALS (HALF_UP — Spark's round())
    * so the two engines' `ln` (1-ulp class differences) and the two
    * execution paths here produce the SAME comparable doubles: the DP
    * sums rounded multiples of 1e-6 in one pinned left-to-right order,
    * so score comparisons are deterministic and genuine ties fall to
    * the structural rule (longest piece wins). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Driver-local Viterbi-EM loop over a collected (word, count) vocab:
    * per round, segment every word by max-probability DP (ties to the
    * LONGEST piece — j ascending, strict `>`), count pieces along the
    * best paths, floor every single-char piece at count 1 (SentencePiece
    * never drops the character alphabet — a dropped char would make its
    * words unsegmentable next round). Semantics pinned to
    * [[unigramTrainDistributed]]; an ExtSpec asserts the paths identical. */
  private def unigramTrainLocal(words: Array[(String, Long)], rounds: Int,
                                maxPieceLen: Int): Seq[(Int, String, Long)] = {
    val seed = new java.util.HashMap[String, java.lang.Long]()
    words.foreach { case (w, wc) =>
      var l = 1
      while (l <= math.min(maxPieceLen, w.length)) {
        var p = 0
        while (p + l <= w.length) {
          seed.merge(w.substring(p, p + l), wc,
            (x, y) => java.lang.Long.valueOf(x + y))
          p += 1
        }
        l += 1
      }
    }
    val chars = new java.util.HashSet[String]()
    seed.keySet.forEach(s => if (s.length == 1) { chars.add(s); () })
    var vocab: java.util.HashMap[String, java.lang.Long] = seed
    val out = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    while (r <= rounds && !vocab.isEmpty) {
      var total = 0L
      vocab.values.forEach(v => total += v)
      val lnTotal = math.log(total.toDouble)
      val logp = new java.util.HashMap[String, java.lang.Double]()
      vocab.forEach((s, n) =>
        logp.put(s, round6(math.log(n.toDouble) - lnTotal)))
      val counts = new java.util.HashMap[String, java.lang.Long]()
      words.foreach { case (w, wc) =>
        val n = w.length
        val score = Array.fill(n + 1)(Double.NegativeInfinity)
        val back = Array.fill(n + 1)(-1)
        score(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxPieceLen)
          while (j < i) { // j ascending = longest piece first; strict >
            val lp = logp.get(w.substring(j, i))
            if (lp != null && score(j) != Double.NegativeInfinity) {
              val s = score(j) + lp
              if (s > score(i)) { score(i) = s; back(i) = j }
            }
            j += 1
          }
          i += 1
        }
        require(back(n) >= 0 || n == 0,
          s"unigramTrain: word '$w' unsegmentable — the char floor " +
            "guarantees this cannot happen; corrupted vocab state")
        var k = n
        while (k > 0) {
          counts.merge(w.substring(back(k), k), wc,
            (x, y) => java.lang.Long.valueOf(x + y))
          k = back(k)
        }
      }
      chars.forEach { c =>
        val cur = counts.get(c)
        if (cur == null || cur < 1L) counts.put(c, 1L)
        ()
      }
      vocab = counts
      val snap = Seq.newBuilder[(Int, String, Long)]
      counts.forEach((s, n) => snap += ((r, s, n.longValue())))
      out ++= snap.result()
      r += 1
    }
    out.result()
  }

  /** Distributed Viterbi-EM fallback: the lattice (word, j, i, piece)
    * joins the current vocab's logp table, and the DP runs as
    * `maxWordLen` slim per-position frames (each the row_number-best
    * candidate per word, score desc then piece length desc — the same
    * tie rule as the local loop), carrying the best path as an array.
    * One logp + one edges checkpoint per round, `maxLen` tiny join jobs
    * — the loudly-warned big-vocab path, exactly [[bpeTrainLoop]]'s
    * posture. */
  private def unigramTrainDistributed(words: DataFrame, rounds: Int,
                                      maxPieceLen: Int,
                                      maxLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = words.sparkSession
    import spark.implicits._
    val seed = words.select(col("wc"), explode(flatten(
        transform(sequence(lit(1), least(lit(maxPieceLen), length(col("w")))),
          l => transform(sequence(lit(1), length(col("w")) - l + 1),
            p => col("w").substr(p, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("wc")).as("n"))
      .lineageCut()
    val chars = seed.filter(length(col("piece")) === 1)
      .select("piece").lineageCut()
    var vocab = seed
    var out = Seq.empty[DataFrame]
    (1 to rounds).foreach { r =>
      val total = vocab.agg(sum(col("n"))).head().getLong(0)
      val lp = vocab.select(col("piece"),
          round(log(col("n").cast("double")) - log(lit(total.toDouble)), 6)
            .as("lp"))
        .lineageCut()
      val edges = words
        .select(col("w"), explode(sequence(lit(1), length(col("w")))).as("i"))
        .select(col("w"), col("i"),
          explode(sequence(greatest(col("i") - maxPieceLen, lit(0)),
            col("i") - 1)).as("j"))
        .withColumn("piece", col("w").substr(col("j") + 1, col("i") - col("j")))
        .join(lp, Seq("piece"))
        .lineageCut()
      val frames = new scala.collection.mutable.ArrayBuffer[DataFrame]()
      frames += words.select(col("w"), col("wc"),
        lit(0.0).as("score"), array().cast("array<string>").as("path"))
      (1 to maxLen).foreach { i =>
        val cands = (math.max(0, i - maxPieceLen) until i).map { j =>
          frames(j).join(
            edges.filter(col("i") === i && col("j") === j)
              .select(col("w"), col("piece"), col("lp")), Seq("w"))
        }.reduce(_.unionByName(_))
        val w = Window.partitionBy("w")
          .orderBy(col("score").desc, length(col("piece")).desc)
        frames += cands
          .withColumn("score", col("score") + col("lp"))
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .select(col("w"), col("wc"), col("score"),
            concat(col("path"), array(col("piece"))).as("path"))
          .lineageCut()
      }
      val finals = (1 to maxLen).map(i =>
          frames(i).filter(length(col("w")) === i))
        .reduce(_.unionByName(_))
      val viterbi = finals.select(col("wc"), explode(col("path")).as("piece"))
        .groupBy("piece").agg(sum(col("wc")).as("n"))
      vocab = viterbi
        .join(chars.withColumn("_isChar", lit(1)), Seq("piece"), "full")
        .select(col("piece"),
          greatest(coalesce(col("n"), lit(0L)),
            coalesce(col("_isChar").cast("long"), lit(0L))).as("n"))
        .filter(col("n") > 0)
        .lineageCut()
      out = out :+ vocab.select(lit(r).as("round"), col("piece"), col("n"))
    }
    out.reduce(_.unionByName(_))
  }

  /**
   * Unigram-LM tokenizer training (Kudo 2018 / SentencePiece's model
   * family — the SECOND of the two tokenizer families real pipelines
   * use, next to [[bpeTrainMerges]]'s BPE), in its deterministic
   * VITERBI-EM form: the seed vocabulary is every substring of length
   * ≤ `maxPieceLen` of the corpus's words (counted with multiplicity,
   * occurrences overlapping), and each round segments every word by
   * MAX-PROBABILITY DP under the current piece probabilities (hard
   * E-step; SentencePiece's soft E-step is forward-backward — the
   * Viterbi member of the same EM family is the one whose every step
   * is engine-replayable and therefore oracle-checkable), re-counts
   * pieces along the best paths, and floors every single-character
   * piece at count 1 (the alphabet is never dropped — a word with a
   * dropped char would be unsegmentable next round). Probabilities
   * enter the DP as round(ln n − ln total, 6) — see [[round6]] for why
   * six decimals make cross-engine comparisons deterministic; DP ties
   * go to the LONGEST piece.
   *
   * Returns (round, piece, n): the piece-count table after each round
   * — the trained artifact (normalize to probabilities at use).
   *
   * Scale: ONE corpus scan (the word-count aggregate) — the q141 BPE
   * recipe; the EM loop runs driver-local over the Zipf-small distinct
   * vocab under `maxLocalVocab`, and falls back to the distributed
   * lattice-DP loop (one logp/edges checkpoint + `maxWordLen` slim
   * join jobs per round) behind a loud warning otherwise. Words longer
   * than `maxWordLen` are refused loudly (they would unbound the
   * distributed DP depth — split pathological tokens upstream).
   */
  def unigramTrain(df: DataFrame, textCol: String, rounds: Int,
                   maxPieceLen: Int = 3, maxWordLen: Int = 32,
                   maxLocalVocab: Int = 2000000): DataFrame = {
    require(rounds >= 1 && rounds <= 100, s"rounds in [1, 100], got $rounds")
    require(maxPieceLen >= 1, s"maxPieceLen >= 1, got $maxPieceLen")
    require(maxWordLen >= 1, s"maxWordLen >= 1, got $maxWordLen")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(wordTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val guard = words.agg(max(length(col("w"))).as("mx"),
      count(lit(1)).as("nw")).head()
    val maxLen = if (guard.isNullAt(0)) 0 else guard.getInt(0)
    require(maxLen <= maxWordLen,
      s"unigramTrain: longest word has $maxLen chars (> maxWordLen=" +
        s"$maxWordLen) — the distributed DP depth is the word length; " +
        "split pathological tokens upstream or raise maxWordLen.")
    if (maxLen == 0)
      return Seq.empty[(Int, String, Long)].toDF("round", "piece", "n")
    val head =
      if (maxLocalVocab == 0) Array.empty[org.apache.spark.sql.Row]
      else words.limit(maxLocalVocab + 1).collect()
    if (head.nonEmpty && head.length <= maxLocalVocab) {
      val arr = head.map(r => (r.getString(0), r.getLong(1)))
      return unigramTrainLocal(arr, rounds, maxPieceLen)
        .toDF("round", "piece", "n")
    }
    org.apache.log4j.Logger.getLogger(getClass).warn(
      s"unigramTrain: vocab exceeds maxLocalVocab=$maxLocalVocab distinct " +
      "words - falling back to the DISTRIBUTED lattice-DP loop " +
      s"(~$maxLen join jobs per round). Raise maxLocalVocab if the " +
      "driver can hold the vocab.")
    unigramTrainDistributed(words.lineageCut(), rounds, maxPieceLen,
      maxLen)
  }

  /** Column segmenting a word with a trained unigram vocabulary — the
    * codegen'd [[UnigramSegmentExpr]]; the vocab snapshot rides
    * `addReferenceObj`, so generated code is one static call. */
  private def unigramSegmentCol(word: Column,
                                vocab: UnigramKernel.Vocab): Column =
    org.apache.spark.sql.graftx.Bridge.column(UnigramSegmentExpr(
      org.apache.spark.sql.graftx.Bridge.expression(word), vocab))

  /**
   * ENCODE the corpus with a trained unigram piece table (the final
   * round of [[unigramTrain]]): per-document subword count under the
   * Viterbi segmentation — [[bpeSegmentCounts]]'s contract for the
   * second tokenizer family, feeding the same `tokenCountCol` packing
   * path. Bit-compatible with training (round-6 log-probs, tie to the
   * longest piece); unknown characters are refused loudly by the
   * kernel.
   *
   * Scale: the DISTINCT-word projection (Zipf-small) is segmented
   * once by the codegen'd expression and joined back on the slim
   * (word, count) key — per-occurrence re-segmentation never happens,
   * and AQE broadcasts the vocab-sized side when it fits.
   */
  def unigramSegmentCounts(df: DataFrame, textCol: String, idCol: String,
                           pieces: Seq[(String, Long)],
                           maxPieceLen: Int = 3): DataFrame = {
    val vocab = UnigramKernel.build(pieces.toArray, maxPieceLen)
    val seg = df.select(explode(wordTokens(col(textCol))).as("w")).distinct()
      .select(col("w"),
        size(unigramSegmentCol(col("w"), vocab)).cast("long").as("_ns"))
    df.select(col(idCol), explode_outer(wordTokens(col(textCol))).as("w"))
      .join(seg, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("_ns")), lit(0L)).as("n_subwords"))
  }

  /** Corpus-wide piece frequencies under the trained segmentation —
    * (piece, n): the distinct-word (w, wc) frame is segmented once,
    * pieces weighted by word multiplicity. */
  def unigramPieceCounts(df: DataFrame, textCol: String,
                         pieces: Seq[(String, Long)],
                         maxPieceLen: Int = 3): DataFrame = {
    val vocab = UnigramKernel.build(pieces.toArray, maxPieceLen)
    df.select(explode(wordTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .select(explode(unigramSegmentCol(col("w"), vocab)).as("piece"),
        col("wc"))
      .groupBy("piece").agg(sum(col("wc")).as("n"))
  }

  /**
   * Train-then-encode in one call — [[unigramTrain]]'s final-round
   * piece table applied via [[unigramSegmentCounts]]: per-doc subword
   * counts, the unigram twin of [[bpeSegmentCounts]]. The trained
   * vocab is driver-sized by construction (substrings of length <=
   * `maxPieceLen`, bounded by the alphabet — the same Zipf-small object
   * the EM loop already holds), so the collect is not a scale hazard;
   * `maxLocalVocab` bounds it loudly all the same.
   */
  def unigramEncodeCounts(df: DataFrame, textCol: String, idCol: String,
                          rounds: Int, maxPieceLen: Int = 3,
                          maxWordLen: Int = 32,
                          maxLocalVocab: Int = 2000000): DataFrame = {
    val fin = unigramTrain(df, textCol, rounds, maxPieceLen, maxWordLen,
        maxLocalVocab)
      .filter(col("round") === rounds)
      .limit(maxLocalVocab + 1).collect()
    require(fin.length <= maxLocalVocab,
      s"unigramEncodeCounts: trained vocab exceeds maxLocalVocab=" +
        s"$maxLocalVocab pieces — raise the cap if the driver can hold it")
    if (fin.isEmpty)
      return df.select(col(idCol), lit(0L).as("n_subwords"))
    unigramSegmentCounts(df, textCol, idCol,
      fin.map(r => (r.getString(1), r.getLong(2))).toSeq, maxPieceLen)
  }

  // ---- Tokenizer artifacts: save / load / encode-from-disk ----------------
  //
  // Train ONCE, encode DAILY: the trained artifact (BPE merge table /
  // unigram piece table) is driver-sized by construction, persists as
  // plain parquet, and a fresh session encodes any corpus from it
  // without retraining — the q153 resume-from-disk contract for the
  // tokenizer family. Loads are bounded probe-collects (cap + 1 rows,
  // loud refusal past the cap), schema validated before use.

  /** Persist a [[bpeTrainMerges]] artifact: (round, pair, n) parquet,
    * rank order recorded in `round`. Overwrites — refreshing a
    * tokenizer artifact in place is the intended lifecycle. */
  def bpeSaveMerges(merges: DataFrame, path: String): Unit = {
    val cols = merges.columns.toSet
    require(Set("round", "pair", "n").subsetOf(cols),
      s"bpeSaveMerges: expected columns (round, pair, n), got ${cols.mkString(",")}")
    merges.select("round", "pair", "n").orderBy("round")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a saved merge table as (left, right) pairs in rank order. */
  def bpeLoadMerges(spark: SparkSession, path: String,
                    maxMerges: Int = 1000000): Seq[(String, String)] = {
    val df = spark.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("round", "pair").subsetOf(cols),
      s"bpeLoadMerges: $path is not a merge artifact (columns ${cols.mkString(",")})")
    val rows = df.select(col("round").cast("int"), col("pair"))
      .orderBy("round").limit(maxMerges + 1).collect()
    require(rows.length <= maxMerges,
      s"bpeLoadMerges: artifact exceeds maxMerges=$maxMerges rounds — " +
        "raise the cap if the driver can hold it")
    rows.map { r =>
      val parts = r.getString(1).split(" ")
      require(parts.length == 2 && parts.forall(_.nonEmpty),
        s"bpeLoadMerges: malformed pair '${r.getString(1)}' at round ${r.getInt(0)}")
      (parts(0), parts(1))
    }.toSeq
  }

  /** Column segmenting a word with a loaded merge table — the codegen'd
    * [[BpeSegmentExpr]]. */
  private def bpeSegmentCol(word: Column, m: BpeKernel.Merges): Column =
    org.apache.spark.sql.graftx.Bridge.column(BpeSegmentExpr(
      org.apache.spark.sql.graftx.Bridge.expression(word), m))

  /**
   * ENCODE a corpus with a SAVED merge artifact — [[bpeSegmentCounts]]
   * without the training pass: per-doc subword counts under the loaded
   * tokenizer, bit-compatible with training's fold (the kernel replays
   * merges round-by-round with the same no-within-round-chaining rule).
   * The distinct-word projection is segmented once by the codegen'd
   * expression and joined back on the slim (word, count) key.
   */
  def bpeSegmentCountsFrom(df: DataFrame, textCol: String, idCol: String,
                           mergesPath: String,
                           maxMerges: Int = 1000000): DataFrame = {
    val m = BpeKernel.build(
      bpeLoadMerges(df.sparkSession, mergesPath, maxMerges).toArray)
    val seg = df.select(explode(wordTokens(col(textCol))).as("w")).distinct()
      .select(col("w"),
        size(bpeSegmentCol(col("w"), m)).cast("long").as("_ns"))
    df.select(col(idCol), explode_outer(wordTokens(col(textCol))).as("w"))
      .join(seg, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("_ns")), lit(0L)).as("n_subwords"))
  }

  /** Persist a unigram piece table: (piece, n) parquet. Pass
    * [[unigramTrain]]'s output filtered to the final round. */
  def unigramSaveVocab(vocab: DataFrame, path: String): Unit = {
    val cols = vocab.columns.toSet
    require(Set("piece", "n").subsetOf(cols),
      s"unigramSaveVocab: expected columns (piece, n), got ${cols.mkString(",")}")
    vocab.select("piece", "n").orderBy("piece")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a saved piece table as (piece, n) rows. */
  def unigramLoadVocab(spark: SparkSession, path: String,
                       maxLocalVocab: Int = 2000000): Seq[(String, Long)] = {
    val df = spark.read.parquet(path)
    val cols = df.columns.toSet
    require(Set("piece", "n").subsetOf(cols),
      s"unigramLoadVocab: $path is not a piece artifact (columns ${cols.mkString(",")})")
    val rows = df.select(col("piece"), col("n").cast("long"))
      .limit(maxLocalVocab + 1).collect()
    require(rows.length <= maxLocalVocab,
      s"unigramLoadVocab: artifact exceeds maxLocalVocab=$maxLocalVocab " +
        "pieces — raise the cap if the driver can hold it")
    rows.map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** ENCODE a corpus with a SAVED unigram piece table — the DP window
    * (`maxPieceLen`) is derived from the loaded pieces themselves. */
  def unigramEncodeCountsFrom(df: DataFrame, textCol: String, idCol: String,
                              vocabPath: String,
                              maxLocalVocab: Int = 2000000): DataFrame = {
    val pieces = unigramLoadVocab(df.sparkSession, vocabPath, maxLocalVocab)
    require(pieces.nonEmpty, s"unigramEncodeCountsFrom: empty artifact at $vocabPath")
    unigramSegmentCounts(df, textCol, idCol, pieces,
      pieces.map(_._1.length).max)
  }

  /**
   * Annotate a frame with per-doc `n_subwords` under a SAVED tokenizer
   * artifact of ANY family — the schema names the family: a merge
   * table (`round`, `pair`) encodes via the BPE replay kernel, a piece
   * table (`piece`, `n`) via the unigram Viterbi kernel, a wordpiece
   * vocab (`wp_piece`) via the greedy longest-match kernel; anything
   * else is refused loudly. This is the ingest-time composition hook: a
   * daily batch annotated at ingest arrives pre-tokenized for the
   * packing planner (`tokenCountCol = "n_subwords"`), and the trained
   * artifact never retrains. All input columns pass through; the join
   * back is on the slim (id, count) key.
   */
  def withSubwordCounts(df: DataFrame, textCol: String, idCol: String,
                        artifactPath: String,
                        maxLocalVocab: Int = 2000000): DataFrame = {
    val schema = df.sparkSession.read.parquet(artifactPath).columns.toSet
    val counts =
      if (Set("round", "pair").subsetOf(schema))
        bpeSegmentCountsFrom(df, textCol, idCol, artifactPath, maxLocalVocab)
      else if (Set("piece", "n").subsetOf(schema))
        unigramEncodeCountsFrom(df, textCol, idCol, artifactPath, maxLocalVocab)
      else if (schema.contains("wp_piece"))
        WordPiece.segmentCountsFrom(df, textCol, idCol, artifactPath,
          maxLocalVocab).drop("n_unk")
      else throw new IllegalArgumentException(
        s"withSubwordCounts: $artifactPath is not a BPE merge table " +
          s"(round, pair, n), a unigram piece table (piece, n) or a " +
          s"wordpiece vocab (wp_piece) — columns ${schema.mkString(",")}")
    df.join(counts, Seq(idCol))
  }

  /** Full per-document profile as one narrow projection. */
  def profile(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(
      col(idCol),
      charCount(col(textCol)).as("n_chars"),
      tokenCount(col(textCol)).as("n_tokens"),
      bpeTokenCount(col(textCol)).as("n_bpe_tokens"),
      punctRatio(col(textCol)).as("punct_ratio"),
      digitRatio(col(textCol)).as("digit_ratio"),
      stopwordRatio(col(textCol)).as("stopword_ratio"),
      meanWordLength(col(textCol)).as("mean_word_len"),
      qualityScore(col(textCol)).as("quality"),
      lang_id(col(textCol)).as("lang_pred"),
      fingerprint64(col(textCol)).as("fingerprint"))
}
