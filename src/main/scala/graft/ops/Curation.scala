package graft.ops

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the cleaning/filtering stage a training-data
  * pipeline runs before dedup (SURVEY.md §2 B14-B17).
  *
  * Scale shapes:
  *  - repetition metrics: per-row array math for the n-gram signals plus ONE
  *    explode→two-level-aggregate for the top-token signal (partial
  *    aggregation makes the exploded shuffle carry (doc_id, token) partial
  *    counts, never raw token lists);
  *  - boilerplate detection: explode distinct shingle hashes → groupBy hash
  *    (map-side combined); the resulting common-ngram table is tiny by
  *    construction (HAVING count ≥ N on an ~unique hash space) and
  *    broadcasts back for the per-doc fraction;
  *  - stratified sampling: one tiny groupBy for class counts (broadcast) +
  *    a pure-projection integer-exact hash filter — scan speed, resumable,
  *    same doc kept on every run/engine;
  *  - pseudonymization: pure projection (sha256 + regexp), scan speed.
  */
object Curation {

  private def toks(c: Column): Column = split(c, " ")

  /** (doc_id, top_cnt): max single-token occurrence count per doc — ONE
    * implementation shared by repetitionMetrics and curatedCorpus, so the
    * fused pipeline stays bit-identical to the standalone stage by
    * construction. (doc_id, token) counts partial-aggregate map-side
    * before the shuffle.
    */
  private def topTokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max("cnt").as("top_cnt"))

  /** B14 — Gopher-style repetition metrics: the fraction of mass held by the
    * most frequent token, and the duplicate fraction among 2-grams and
    * 3-grams. Heavily repetitive machine-generated text scores high on all
    * three; `keep` applies the published-style thresholds. The n-gram
    * signals are per-row (distinct-vs-total over the gram arrays); the
    * top-token signal is an explode→groupBy so no row ever does quadratic
    * work, and at 100 TB the exploded aggregate partial-combines per
    * partition before shuffling (doc_id, token) pairs.
    */
  def repetitionMetrics(spark: SparkSession, dir: String,
                        maxTopTokenFrac: Double = 0.15,
                        maxDup2Frac: Double = 0.15,
                        maxDup3Frac: Double = 0.10): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = toks(col("text"))
    // Duplicate-gram fraction = 1 - distinct/total. Distinct grams count via
    // the codegen'd ShingleHashes expression (one tight loop per row — the
    // interpreted transform-lambda formulation is this repo's measured 20×
    // bench trap); total gram count is closed-form. Distinct HASHES stand in
    // for distinct strings exactly as in ngramJaccard: 60-bit md5 prefixes,
    // collision odds ~|grams|²/2⁶¹ ≈ 0, and the oracle's list_distinct over
    // the strings agrees.
    def dupFrac(k: Int): Column = {
      val total = greatest(size(tok) - lit(k - 1), lit(1)).cast("double")
      val distinctGrams = size(
        VectorExpressions.shingleHashes(col("text"), k, md5Based = true).getField("hv"))
        .cast("double")
      round(lit(1.0) - distinctGrams / total, 6)
    }
    val top = topTokenCounts(docs)
    docs
      .select(col("doc_id"), size(tok).cast("long").as("n_tokens"),
        dupFrac(2).as("dup_2gram_frac"), dupFrac(3).as("dup_3gram_frac"))
      .join(top, Seq("doc_id"))
      .withColumn("top_token_frac",
        round(col("top_cnt").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("keep",
        col("top_token_frac") <= maxTopTokenFrac &&
          col("dup_2gram_frac") <= maxDup2Frac &&
          col("dup_3gram_frac") <= maxDup3Frac)
      .select("doc_id", "n_tokens", "top_cnt", "top_token_frac",
        "dup_2gram_frac", "dup_3gram_frac", "keep")
      .orderBy("doc_id")
  }

  /** (doc_id, h): one row per DISTINCT k-shingle hash per doc (60-bit
    * md5-prefix hash — engine-portable, one digest per shingle).
    */
  private def docShingleHashes(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(VectorExpressions.shingleHashes(col("text"), k, md5Based = true)
        .getField("hv")).as("h"))

  /** B15a — boilerplate n-gram detection: k-shingles appearing in at least
    * `minDocs` distinct documents (headers, footers, license blocks, nav
    * chrome). Shingles are distinct within each doc, so a plain count equals
    * the distinct-doc count — one map-side-combined groupBy on the hash.
    */
  def boilerplateNgrams(spark: SparkSession, dir: String,
                        shingleK: Int = 3, minDocs: Int = 5): DataFrame =
    boilerplate0(Tables.documents(spark, dir), shingleK, minDocs)
      .orderBy("h")

  private def boilerplate0(docs: DataFrame, shingleK: Int, minDocs: Int): DataFrame =
    docShingleHashes(docs, shingleK)
      .groupBy("h")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .where(col("n_docs") >= minDocs)

  /** B15b — per-document boilerplate fraction: the share of a doc's distinct
    * k-shingles that are corpus-common. The common-ngram table is tiny
    * (bounded by |corpus shingles| / minDocs) and broadcasts; the per-doc
    * side streams through one left join + aggregate. Docs past
    * `maxBoilerFrac` are template/chrome pages a quality pipeline drops.
    */
  def boilerplateFraction(spark: SparkSession, dir: String,
                          shingleK: Int = 3, minDocs: Int = 5,
                          maxBoilerFrac: Double = 0.5): DataFrame = {
    // One shingling+hashing pass feeds both the common-ngram aggregate and
    // the per-doc join side (persisted: (doc_id, h) longs only, a fraction
    // of the raw text; without it the expensive explode runs twice). The
    // cache is session-lifetime by design — the returned frame is lazy, so
    // there is no safe unpersist point inside this builder; MEMORY_AND_DISK
    // persists are LRU-evictable under pressure, and batch drivers (Bench)
    // clear the cache between queries.
    val hashed = docShingleHashes(Tables.documents(spark, dir), shingleK).persist()
    val boiler = hashed.groupBy("h")
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("h"), lit(1).as("is_boiler"))
    // Plain join: the common-shingle table is corpus-scale on heavily
    // templated data (its bound is |shingles|/minDocs) — let AQE decide
    // between broadcast and hash join from the measured size.
    hashed
      .join(boiler, Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum("is_boiler"), lit(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        round(col("n_boiler").cast("double") / col("n_shingles").cast("double"), 6))
      .withColumn("keep", col("boiler_frac") <= maxBoilerFrac)
      .orderBy("doc_id")
  }

  /** B57 — content novelty score: per document, the fraction of its
    * distinct 8-gram shingles NOT already present in any earlier document
    * (doc_id order = ingest order) — "how much of this document is new
    * content". The per-DOC scalar complement to B26's passage dedup (which
    * keeps/drops passages) and B15's boilerplate fraction (which scores
    * against corpus-COMMON shingles regardless of order): a scraper
    * re-crawling yesterday's pages scores ~0 here while still passing
    * exact dedup, which is exactly the incremental-crawl waste signal a
    * data-acquisition budget needs.
    *
    * Shapes: one shingle explode (distinct-per-doc by ShingleHashes'
    * construction) persisted to feed BOTH the first-seen aggregate
    * (groupBy h → min(doc_id), map-side combined on an ~unique hash space)
    * and the scoring join (hash-keyed, never all-pairs); the per-doc
    * collapse is a two-column partial aggregate. Released by
    * [[graft.Caches]].clear.
    */
  def contentNovelty(spark: SparkSession, dir: String, shingleK: Int = 8): DataFrame = {
    val hashed = docShingleHashes(Tables.documents(spark, dir), shingleK).persist()
    val first = hashed.groupBy("h").agg(min(col("doc_id")).as("first_doc"))
    hashed.join(first, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("first_doc") < col("doc_id")).cast("long")).as("n_seen_before"))
      .select(col("doc_id"), col("n_shingles"), col("n_seen_before"),
        round(lit(1.0) - col("n_seen_before").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
      .orderBy("doc_id")
  }

  /** B16 — deterministic stratified rebalancing sample: downsample each
    * language class to the size of the smallest class. The keep decision is
    * integer-exact — u * class_n < target_n * 2^24 with u a 24-bit
    * content-free hash of the doc id — so both engines and every rerun keep
    * the SAME documents (no RNG, no float rounding at the boundary). Class
    * counts are one tiny groupBy that broadcasts; the filter itself is a
    * pure projection at scan speed.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("lang_n"))
    val target = counts.agg(min("lang_n").as("target_n"))
    val u = DocHash.hash24("sample:")
    docs.join(broadcast(counts), Seq("lang"))
      .crossJoin(broadcast(target))
      .where(u * col("lang_n") < col("target_n") * lit(1L << 24))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** B21 — the composed curation pipeline: documents that pass quality
    * scoring AND repetition filters AND the boilerplate cap AND survive
    * MinHash near-dup removal — i.e. the corpus a training run actually
    * reads. FUSED: one scan computes every per-row signal (quality ratios,
    * dup-gram fractions, and ONE 3-shingle ShingleHashes pass whose h24
    * feeds the MinHash signatures and whose hv feeds both the boilerplate
    * aggregate and the dup-3-gram signal) into a persisted narrow base;
    * the standalone stage operators each re-shingled the corpus, tripling
    * the dominant cost (VERDICT r3 "What's wrong" #4). Only the top-token
    * signal (an explode→partial-aggregated groupBy) and the bounded-bucket
    * LSH dedup remain as keyed side-aggregates. Thresholds and rounding
    * are bit-identical to the standalone stages, so the single-statement
    * DuckDB oracle replays the fused pipeline unchanged.
    *
    * Gopher stage (r18, VERDICT r17 #8): `gopherStages` names the B8f
    * rules the pipeline additionally gates on — the SAME
    * [[gopherRuleCols]] thresholds as the standalone report, evaluated
    * over a GopherStats struct that rides in the fused base scan (no
    * extra text pass). Default: the seven STRUCTURAL rules; the stopword
    * rule is excluded by default because the synthetic corpus' 31-word
    * vocabulary contains <2 of Gopher's 8 stopwords in most docs — with
    * it on, the flagship composition filters everything and demonstrates
    * only the thresholds (the same corpus-tuning argument as qualityMin);
    * a production call site passes all eight.
    */
  def curatedCorpus(spark: SparkSession, dir: String,
                    qualityMin: Double = 0.1,
                    maxTopTokenFrac: Double = 0.15,
                    maxDup2Frac: Double = 0.15,
                    maxDup3Frac: Double = 0.10,
                    minDocs: Int = 5,
                    maxBoilerFrac: Double = 0.5,
                    gopherStages: Seq[String] = Seq("word_count",
                      "mean_word_len", "hash_ratio", "ellipsis_ratio",
                      "bullet_lines", "ellipsis_lines", "alpha_words")): DataFrame = {
    // The pipeline thresholds quality_score directly (default 0.1) rather
    // than reusing TextAnalysis.quality's stricter standalone `keep`: cutoffs
    // are corpus-tuned in practice, and a flagship composition that filters
    // a normal corpus to nothing demonstrates only the thresholds.
    val docs = Tables.documents(spark, dir)
    val tok = toks(col("text"))
    // one pass over the text: token stats + 2-gram distinct count + the
    // 3-shingle hash struct; persisted narrow (ids + two long arrays)
    val base = docs.select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(tok).cast("long").as("n_tok"),
        size(array_distinct(tok)).cast("long").as("n_uniq"),
        size(VectorExpressions.shingleHashes(col("text"), 2, md5Based = true).getField("hv"))
          .cast("long").as("n2_distinct"),
        VectorExpressions.shingleHashes(col("text"), 3, md5Based = true).as("hs"),
        VectorExpressions.gopherStats(col("text"), gopherStops).as("_g"))
      .persist()
    // the selected Gopher rules gate as one more scan-fused predicate —
    // stats bind straight to the base's struct fields, thresholds are
    // gopherRuleCols' own
    val gopherPred: Column = {
      val stats = gopherStatCols(col("_g")).toMap
      val byName = gopherRuleCols(stats).toMap
      val unknown = gopherStages.filterNot(byName.contains)
      require(unknown.isEmpty, s"unknown gopher rules: $unknown")
      gopherStages.map(byName).foldLeft(lit(true))(_ && _)
    }
    val nTok = col("n_tok").cast("double")
    val qualityScore =
      round(least(lit(1.0), nTok / 200.0) * (col("n_uniq").cast("double") / nTok), 6)
    val dup2 = round(lit(1.0) - col("n2_distinct").cast("double") /
      greatest(col("n_tok") - 1L, lit(1L)).cast("double"), 6)
    val dup3 = round(lit(1.0) - size(col("hs.hv")).cast("double") /
      greatest(col("n_tok") - 2L, lit(1L)).cast("double"), 6)
    // top-token mass: the one signal that needs token rows — explode from a
    // second text scan (tokens never sit in the persisted base)
    val top = topTokenCounts(docs)
    // boilerplate: distinct-shingle hashes from the SAME hv used by dup3
    val hashed = base.select(col("doc_id"), explode(col("hs.hv")).as("h"))
    val boiler = hashed.groupBy("h").agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("h"), lit(1).as("is_boiler"))
    // Plain join, NOT a forced broadcast: the common-shingle table grows
    // with the corpus on exactly the heavily-templated data this filter
    // targets (bounded only by |shingles|/minDocs); AQE broadcasts it when
    // it measures small and hash-joins otherwise.
    val bkeep = hashed.join(boiler, Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), coalesce(sum("is_boiler"), lit(0L)).as("n_boiler"))
      .where(round(col("n_boiler").cast("double") / col("n_sh").cast("double"), 6)
        <= maxBoilerFrac)
      .select("doc_id")
    // near-dup drop list: MinHash signatures from the SAME h24 (cheap
    // codegen'd fold over cached hashes; no re-shingling)
    val signed = base.select(col("doc_id"),
      VectorExpressions.minhashFamily(col("hs.h24"),
        Dedup.minhashCoefs(32), Dedup.MinhashP).as("sig"))
    val dups = Dedup.pairsFrom(signed, numHashes = 32, bands = 16,
        threshold = 0.5, maxBucket = 256, portable = true)
      .select(col("id_b").as("doc_id")).distinct()
    base
      .join(top, Seq("doc_id"))
      .where(qualityScore >= qualityMin &&
        round(col("top_cnt").cast("double") / nTok, 6) <= maxTopTokenFrac &&
        dup2 <= maxDup2Frac && dup3 <= maxDup3Frac && gopherPred)
      .join(bkeep, Seq("doc_id"))
      .join(dups, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** B25 — temperature-flattened rebalancing (√-law, the downsample-only
    * analog of mT5-style temperature sampling at α = 0.5): every language
    * class keeps `sqrt(min_n · n_l)` documents — the geometric mean of its
    * size and the smallest class's — so large classes are flattened toward
    * the small ones without ever upsampling; the smallest class keeps 100%.
    * The keep rule is `u < sqrt(min_n / n_l) · 2²⁴` with u a content-free
    * 24-bit hash: IEEE division and sqrt are correctly-rounded on every
    * engine (unlike pow/ln), and ·2²⁴ is an exact exponent shift, so both
    * engines keep the SAME documents. Class counts broadcast; the filter is
    * a pure projection at scan speed.
    */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("lang_n"))
    val minN = counts.agg(min("lang_n").as("min_n"))
    val u = DocHash.hash24("temp:")
    docs.join(broadcast(counts), Seq("lang"))
      .crossJoin(broadcast(minN))
      .where(u.cast("double") <
        sqrt(col("min_n").cast("double") / col("lang_n").cast("double")) * lit((1L << 24).toDouble))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** B31 — token-budget corpus mix: fill a per-language TOKEN budget (the
    * unit a training run actually allocates) by greedy prefix in
    * content-free hash order — each doc is admitted iff the tokens already
    * taken for its language are still under budget, so the mix overshoots
    * by at most one document per class and is deterministic across
    * engines/reruns (integer token counts, integer running sum, 24-bit
    * md5 hash order; no RNG, no float boundary). Unlike the doc-count
    * samplers (B16/B25), this is the "30% code / 70% text, 1B tokens"
    * budgeting step.
    *
    * Scale shape: a global running sum per language would haul the whole
    * class through ONE window partition — the biggest language IS most of
    * a 100 TB corpus, so that window is a skew bomb. Instead the running
    * sum is two-level, exploiting that the admission order (u, doc_id) is
    * identical to (shard, u, doc_id) when `shard` is the TOP bits of u:
    * per-(lang, shard) token totals partial-aggregate map-side into a
    * langs×shards table whose shard-order prefix sum is a window over
    * that TINY table; the base offset joins back (broadcast — the shard
    * table is KBs) and each doc adds a within-(lang, shard) ROWS-framed
    * running sum. Same admission set as the single-window form for every
    * `shardBits`; no partition ever holds more than ~1/2^shardBits of a
    * class. The shuffles carry (id, lang, ntok, u) — no text.
    */
  /** Two-level EXCLUSIVE prefix aggregate of `weight` over the
    * deterministic (u, doc_id) hash order within `key` — the shared
    * scaffold of [[tokenBudgetMix]] (weight = token count) and
    * [[sourceCapSample]] (weight = 1, so prefix + 1 is the rank). `shard`
    * = top bits of u makes (shard, u, doc_id) order ≡ (u, doc_id) order,
    * so per-(key, shard) totals partial-aggregate into a tiny table whose
    * shard-order prefix sum broadcasts back as each shard's base, and the
    * in-shard window never holds more than ~1/2^shardBits of any key —
    * the hot class that NEEDS capping is exactly the partition that would
    * explode a single-level window (measured: ScaleSpec holds per-task
    * input ≤2× mean on a 90%-one-class corpus). Adds a `before` column;
    * the shuffles carry ids and hashes, never text.
    */
  private def shardedPrefix(base: DataFrame, key: String, weight: Column,
                            shardBits: Int): DataFrame = {
    require(shardBits >= 1 && shardBits <= 24,
      s"shardBits must be in [1, 24] (u is a 24-bit hash), got $shardBits")
    val byShardW = Window.partitionBy(key).orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inShardW = Window.partitionBy(key, "shard").orderBy("u", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardBase = base.groupBy(key, "shard")
      .agg(sum(weight).as("shard_w"))
      .withColumn("shard_before", coalesce(sum(col("shard_w")).over(byShardW), lit(0L)))
      .select(col(key), col("shard"), col("shard_before"))
    base.join(broadcast(shardBase), Seq(key, "shard"))
      .withColumn("before",
        col("shard_before") + coalesce(sum(weight).over(inShardW), lit(0L)))
  }

  def tokenBudgetMix(spark: SparkSession, dir: String,
                     perLangTokens: Long = 2000, shardBits: Int = 6): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val u = DocHash.hash24("mix:")
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"), u.as("u"))
      .withColumn("shard", shiftright(col("u"), 24 - shardBits))
    shardedPrefix(base, "lang", col("ntok"), shardBits)
      .withColumn("tok_before", col("before"))
      .where(col("tok_before") < perLangTokens)
      .select("doc_id", "lang", "source", "ntok", "tok_before")
      .orderBy("doc_id")
  }

  /** B32 — per-source document caps (the C4/RefinedWeb "domain cap" step):
    * keep at most `cap` documents from each source, chosen in content-free
    * deterministic 24-bit-md5 hash order — a crawl where one domain is half
    * the corpus must not become half the training set, and the selection
    * must be reproducible across engines and reruns (no RNG, no float
    * boundary; ties in the hash break on doc_id).
    *
    * Scale shape: a single `row_number` window per source partitions the
    * corpus by source — and the hot domain that NEEDS capping is exactly
    * the partition that explodes. [[shardedPrefix]] is the two-level fix
    * (weight 1: the exclusive doc-count prefix + 1 IS the hash-order
    * rank). Selection is identical for every `shardBits` (spec-pinned).
    */
  def sourceCapSample(spark: SparkSession, dir: String,
                      cap: Long = 10, shardBits: Int = 6): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val u = DocHash.hash24("cap:")
    val base = docs.select(col("doc_id"), col("lang"), col("source"), u.as("u"))
      .withColumn("shard", shiftright(col("u"), 24 - shardBits))
    shardedPrefix(base, "source", lit(1L), shardBits)
      .withColumn("rank_in_source", (col("before") + 1L).cast("long"))
      .where(col("rank_in_source") <= cap)
      .select("doc_id", "lang", "source", "rank_in_source")
      .orderBy("doc_id")
  }

  /** B16b — weighted sampling without replacement per source: PRIORITY
    * SAMPLING (Duffield-Lund-Thorup, JACM '07). Each doc draws priority
    * q = w/u with w its weight (n_chars — sample long docs ∝ their token
    * mass) and u a content-free uniform from the shared 24-bit md5 order;
    * the k highest-priority docs per source are the sample, and
    * est_weight = max(w, τ) with τ the (k+1)-th priority makes
    * Σ est_weight an UNBIASED estimator of the source's total weight —
    * the sketch that answers "sample k docs per source, weight-
    * proportionally, and still estimate source mass from the sample
    * alone". Chosen over the classic A-ES exponential-key scheme
    * DELIBERATELY: A-ES keys need pow/ln, which are library-dependent in
    * the last ulp (selection could flip cross-engine at a rank boundary),
    * while q = w/u is ONE IEEE division — correctly rounded, bit-identical
    * in any engine — so the sample, the threshold, and the estimator all
    * replay exactly in DuckDB. Ties (identical q) break by doc_id.
    *
    * Scale shape: one projection computes q at scan speed; the per-source
    * top-(k+1) is a ranked window bounded by the source partition (the
    * hot-source two-level scaffold of [[sourceCapSample]] applies verbatim
    * if a source dominates); τ re-attaches by one broadcast-sized join
    * (one row per source). Nothing corpus-wide ever sorts.
    */
  def prioritySample(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir).where(col("n_chars") > 0)
    val u = (DocHash.hash24("priority:") + 1L).cast("double") // (0, 2^24]
    val base = docs.select(col("doc_id"), col("source"), col("n_chars"),
      (col("n_chars").cast("double") / u).as("q"))
    val win = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    val ranked = base.withColumn("rnk", row_number().over(win))
    val taus = ranked.where(col("rnk") === k + 1)
      .select(col("source"), col("q").as("tau"))
    ranked.where(col("rnk") <= k)
      .join(broadcast(taus), Seq("source"), "left_outer")
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(col("q"), 6).as("priority"),
        round(when(col("tau").isNull, col("n_chars").cast("double"))
          .otherwise(greatest(col("n_chars").cast("double"), col("tau"))), 6)
          .as("est_weight"))
      .orderBy("source", "doc_id")
  }

  /** B8d — multi-signal QUALITY ENSEMBLE: one per-doc score combining the
    * B8 heuristic quality score, the B33 bigram-coverage score, and the
    * B35 LM cross-entropy (sign-inverted — lower entropy is better) as the
    * mean of their per-signal z-scores. Single heuristics are gameable and
    * scale-skewed (quality_score saturates at 200 tokens; coverage and
    * perplexity move on different scales entirely); z-normalizing puts the
    * three on one axis so the ensemble ranks by AGREEMENT — the
    * FineWeb/DataComp-style multi-filter blend, as one engine-exact
    * operator instead of a notebook.
    *
    * Float discipline: each input is already a 6-dp-rounded double; the
    * corpus moments accumulate in DECIMAL (sum and sum-of-squares exact at
    * any partition order), variance/std/z run in double from those exact
    * sums (sqrt and division are IEEE-exact), so the DuckDB oracle lands
    * on identical bits. Nullable signals (single-token docs have no
    * bigrams) z-score over their non-null population and drop out of that
    * doc's mean (`n_signals` says which); a zero-variance signal
    * contributes nothing rather than dividing by zero.
    *
    * Scale shape: the three component pipelines (each already registered,
    * plan-audited, and 50×-measured) + two doc_id-keyed joins + ONE
    * broadcast scalar row of moments + a projection. Nothing new shuffles.
    */
  /** The three-signal per-doc join (quality_score / coverage /
    * cross_entropy) — ONE definition shared by [[qualityEnsemble]] and
    * [[signalAgreement]], so the blend and its diagnostic can never
    * disagree on what a "signal" is.
    *
    * r19 fusion (guide §2.4, VERDICT r18 #7): B33's coverage and B35's
    * cross-entropy both derive from the SAME per-(doc, bigram) count frame
    * and the SAME corpus-wide bigram aggregate, so composing the two
    * registered queries ran that derivation twice (two scoring joins, two
    * per-doc aggregates, a separate vocab scan) plus a doc_id join to glue
    * them back together. Here ONE multi-order kernel pass feeds ONE model
    * table carrying BOTH the add-k log-probability and the common-bigram
    * flag, ONE scoring join and ONE per-doc aggregate produce both
    * columns. Column values are identical to the component queries'
    * (CurationSpec pins this frame against the three-way component join;
    * the count arithmetic is integer-exact and cross_entropy is the same
    * Σ cnt·ln p over identical exact counts, rounded at 6 dp — B35's
    * float budget absorbs partial-aggregation order). The constants are
    * the component queries' registered defaults: addK = 0.5
    * (lmPerplexity), minCount = 5 (bigramCoverage).
    */
  private[graft] def ensembleSignals(spark: SparkSession, dir: String): DataFrame = {
    val q = graft.ops.TextAnalysis.quality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val addK = 0.5
    val minCount = 5L
    // persisted UNEXPLODED per-doc gram arrays, LAZILY filled — see
    // lmPerplexity's measured argument (an eager blocking fill lost at
    // both sf0.1 and 50×). Released by graft.Caches.clear.
    val gramArrs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.VectorExpressions.ngramMultiCounts(col("text"), 2).as("garr"))
      .persist()
    def ordRows(n: Int): DataFrame = gramArrs
      .select(col("doc_id"), explode(col("garr")).as("g"))
      .where(col("g.n") === n)
      .select(col("doc_id"), col("g.g").as("gram"), col("g.c").as("cnt"))
    val perDoc = ordRows(2)
      .select(col("doc_id"), col("gram").as("bigram"), col("cnt"))
    val bi = perDoc.groupBy("bigram").agg(sum(col("cnt")).as("cbi"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val starts = bi.groupBy("w1").agg(sum(col("cbi")).as("cw"))
    val vocab = ordRows(1).agg(count_distinct(col("gram")).as("vocab"))
    val model = bi.join(starts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bigram"), (col("cbi") >= minCount).as("is_common"),
        log((col("cbi") + lit(addK)) / (col("cw") + lit(addK) * col("vocab"))).as("lp"))
    val scored = perDoc.join(model, Seq("bigram"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(when(col("is_common"), col("cnt")).otherwise(0L)).as("n_common"),
        sum(col("cnt") * col("lp")).as("s"))
    q.join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("quality_score"),
        when(col("n_bigrams").isNull, lit(null).cast("double"))
          .otherwise(round(col("n_common").cast("double") / col("n_bigrams").cast("double"), 6))
          .as("coverage"),
        round(-col("s") / col("n_bigrams"), 6).as("cross_entropy"))
  }

  def qualityEnsemble(spark: SparkSession, dir: String): DataFrame = {
    // Persisted (r18, guide §2.4/§5): the three-signal join feeds TWO
    // consumers — the corpus-moments aggregate and the final z-score
    // projection. Without the persist the whole three-pipeline join ran
    // twice (once per consumer); the persisted frame is doc_id + three
    // doubles. Released by graft.Caches.clear like the component caches.
    val joined = ensembleSignals(spark, dir).persist()
    def dec(x: Column) = x.cast("decimal(18,6)")
    val stats = joined.agg(
      count(lit(1)).as("n"),
      sum(dec(col("quality_score"))).as("s_q"),
      sum(dec(col("quality_score")) * dec(col("quality_score"))).as("ss_q"),
      count(col("coverage")).as("n_c"),
      sum(dec(col("coverage"))).as("s_c"),
      sum(dec(col("coverage")) * dec(col("coverage"))).as("ss_c"),
      count(col("cross_entropy")).as("n_p"),
      sum(dec(col("cross_entropy"))).as("s_p"),
      sum(dec(col("cross_entropy")) * dec(col("cross_entropy"))).as("ss_p"))
    def zOf(x: Column, s: Column, ss: Column, n: Column): Column = {
      val mean = s.cast("double") / n
      val std = sqrt(ss.cast("double") / n - mean * mean)
      when(x.isNotNull && std > 0, (x - mean) / std)
    }
    joined.crossJoin(broadcast(stats))
      .withColumn("z_q", zOf(col("quality_score"), col("s_q"), col("ss_q"), col("n")))
      .withColumn("z_c", zOf(col("coverage"), col("s_c"), col("ss_c"), col("n_c")))
      .withColumn("z_p", -zOf(col("cross_entropy"), col("s_p"), col("ss_p"), col("n_p")))
      .withColumn("n_signals",
        (col("z_q").isNotNull.cast("long") + col("z_c").isNotNull.cast("long") +
          col("z_p").isNotNull.cast("long")))
      .select(col("doc_id"), col("quality_score"), col("coverage"), col("cross_entropy"),
        col("n_signals"),
        round((coalesce(col("z_q"), lit(0.0)) + coalesce(col("z_c"), lit(0.0)) +
          coalesce(col("z_p"), lit(0.0))) / col("n_signals"), 6).as("ensemble"))
      .orderBy("doc_id")
  }

  /** B8e — SIGNAL-AGREEMENT matrix: pairwise Pearson correlation among the
    * ensemble's three signals over the docs where BOTH members of a pair
    * are present. The diagnostic behind B8d's "rank by agreement" premise:
    * near-1 correlations mean the signals are redundant (the blend adds
    * nothing over any one of them), near-0 means they measure different
    * failure modes (the blend is earning its keep), and a SIGN FLIP on
    * cross_entropy (expected positive vs quality under its sign-inverted
    * role) says a signal is mis-calibrated for this corpus before it
    * pollutes the ensemble — the check a curation run does when
    * transplanting filters to a new source mix.
    *
    * Float discipline as B8d: counts and sums (x, y, x², y², xy per pair,
    * restricted to both-present rows) accumulate in DECIMAL — exact at any
    * partition order — and r = (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    * runs in doubles from those exact sums, so DuckDB lands on identical
    * bits; a zero-variance side yields NULL r, never a division by zero.
    * One pass: the component pipelines + ONE 18-sum aggregate row,
    * exploded to 3 rows driver-free.
    */
  def signalAgreement(spark: SparkSession, dir: String): DataFrame = {
    val joined = ensembleSignals(spark, dir)
    def dec(x: Column) = x.cast("decimal(18,6)")
    def sums(x: String, y: String, tag: String) = {
      val both = col(x).isNotNull && col(y).isNotNull
      Seq(
        count(when(both, lit(1))).as(s"n_$tag"),
        sum(when(both, dec(col(x)))).as(s"${tag}_sx"),
        sum(when(both, dec(col(y)))).as(s"${tag}_sy"),
        sum(when(both, dec(col(x)) * dec(col(x)))).as(s"${tag}_sxx"),
        sum(when(both, dec(col(y)) * dec(col(y)))).as(s"${tag}_syy"),
        sum(when(both, dec(col(x)) * dec(col(y)))).as(s"${tag}_sxy"))
    }
    val aggs = sums("quality_score", "coverage", "qc") ++
      sums("quality_score", "cross_entropy", "qp") ++
      sums("coverage", "cross_entropy", "cp")
    val m = joined.agg(aggs.head, aggs.tail: _*)
    def pairStruct(name: String, tag: String) = {
      val n = col(s"n_$tag").cast("double")
      def d(c: String) = col(s"${tag}_$c").cast("double")
      val num = n * d("sxy") - d("sx") * d("sy")
      val den2 = (n * d("sxx") - d("sx") * d("sx")) * (n * d("syy") - d("sy") * d("sy"))
      struct(lit(name).as("pair"), col(s"n_$tag").cast("long").as("n_both"),
        when(den2 > 0, round(num / sqrt(den2), 6)).as("r"))
    }
    m.select(explode(array(
      pairStruct("coverage~cross_entropy", "cp"),
      pairStruct("quality_score~coverage", "qc"),
      pairStruct("quality_score~cross_entropy", "qp"))).as("row"))
      .select(col("row.pair").as("pair"), col("row.n_both").as("n_both"),
        col("row.r").as("r"))
      .orderBy("pair")
  }

  /** B41 — training-order shuffle + shard assignment: the step between a
    * curated corpus and a training run. Each document gets `pos`, its
    * 1-based position in a deterministic pseudo-random global order (the
    * content-free 24-bit-md5 order every sampler here uses, under its own
    * `shuffle:` prefix so the training order is decorrelated from the
    * split/sample orders), and `out_shard = (pos-1) mod nShards`, the
    * round-robin shard that order is dealt into — so every data-parallel
    * reader sees an unbiased interleaved slice of the shuffle, not a
    * contiguous (and therefore hash-range-biased) block. Deterministic ⇒
    * reproducible across engines, reruns, and restarts; no RNG state to
    * checkpoint.
    *
    * Scale shape: a naive global `row_number()` is ONE unpartitioned sort
    * of the corpus — the exact single-partition window this file exists to
    * avoid. [[shardedPrefix]] with a constant key is the two-level fix:
    * per-shard counts collapse to a ≤2^shardBits-row broadcast table whose
    * prefix sums are each shard's base offset, and the in-shard rank
    * window holds ~1/2^shardBits of the corpus. shardBits can rise toward
    * 24 as the corpus grows, with two caveats at the extreme: the
    * broadcast shard table is 2^shardBits rows (at 24, ~16M rows — raise
    * only as far as the window width requires), and the order is only as
    * random as the 24-bit hash — once the corpus size approaches 2^24
    * docs, hash ties grow into runs ordered by doc_id, so sequential-id
    * runs of ~n/2^24 docs ride together in the order (widen the hash
    * before relying on the interleave property past ~10M docs).
    * The shuffles carry (doc_id, u) — never text; a writer materializes
    * the order with `repartition(col("out_shard"))` +
    * `sortWithinPartitions("pos")`, one shuffle, no global sort.
    */
  def trainingOrder(spark: SparkSession, dir: String,
                    nShards: Long = 8, shardBits: Int = 6): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val docs = Tables.documents(spark, dir)
    val u = DocHash.hash24("shuffle:")
    val base = docs.select(col("doc_id"), u.as("u"))
      .withColumn("k", lit("all"))
      .withColumn("shard", shiftright(col("u"), 24 - shardBits))
    shardedPrefix(base, "k", lit(1L), shardBits)
      .withColumn("pos", (col("before") + 1L).cast("long"))
      // `before` IS the exclusive prefix (pos - 1), already non-negative
      .withColumn("out_shard", (col("before") % nShards).cast("long"))
      .select("doc_id", "pos", "out_shard")
      .orderBy("doc_id")
  }

  /** B52 — filter-funnel report: survivors and per-stage drops through the
    * ordered, CONJUNCTIVE curation gauntlet (length → min words → repeated-
    * bigram repetition, the C4/Gopher stage order) — the observability
    * artifact every curation run ships with its output, because "we kept
    * 61%" is meaningless without "stage 2 took 19% of it". Cumulative
    * semantics: a doc counts as surviving stage k iff it passed stages
    * 1..k, so `dropped_here` attributes each loss to the FIRST stage that
    * rejected it — the number that tells you which filter to re-tune.
    *
    * One scan: every stage predicate is per-row array/scalar math (the
    * repeated-bigram fraction is B14's `dup_2gram_frac`, same codegen'd
    * ShingleHashes loop, same rounding — one signal definition, not two
    * drifting copies), the aggregate is a single map-side partial
    * collapsing to ONE row, and `stack` unpivots that row into the 4-stage
    * report. Zero shuffles beyond the final 1-row collapse — at 100 TB
    * this costs exactly one pass over the text.
    *
    * Engine-exactness: stage thresholds compare integers or 6-dp-rounded
    * single-division doubles, so the oracle replays bit-identically.
    */
  /** Per-doc duplicate-2-gram fraction — B14's signal, factored so the
    * funnel and the quality-classifier features share ONE definition.
    */
  private[ops] def dup2gramFrac: Column = {
    val tok = toks(col("text"))
    val total2 = greatest(size(tok) - lit(1), lit(1)).cast("double")
    val distinct2 = size(
      VectorExpressions.shingleHashes(col("text"), 2, md5Based = true).getField("hv"))
      .cast("double")
    round(lit(1.0) - distinct2 / total2, 6)
  }

  /** The funnel's per-doc stage flags (length, min-words, repetition) —
    * ONE definition shared by the B52 report and B61's weak-supervision
    * labels, so the distilled classifier can never drift from the report
    * it distills (the topTokenCounts discipline).
    */
  private[ops] def funnelFlags(minChars: Long, maxChars: Long,
                               minWords: Int, maxRep: Double): (Column, Column, Column) =
    ((col("n_chars") >= minChars && col("n_chars") <= maxChars),
      (size(toks(col("text"))) >= minWords),
      (dup2gramFrac <= maxRep))

  def filterFunnel(spark: SparkSession, dir: String,
                   minChars: Long = 100, maxChars: Long = 20000,
                   minWords: Int = 30, maxRep: Double = 0.07): DataFrame = {
    val (p1, p2, p3) = funnelFlags(minChars, maxChars, minWords, maxRep)
    val flags = Tables.documents(spark, dir).select(
      p1.as("f1"), p2.as("f2"), p3.as("f3"))
    val agg = flags.agg(
      count(lit(1)).as("total"),
      sum(col("f1").cast("long")).as("s1"),
      sum((col("f1") && col("f2")).cast("long")).as("s2"),
      sum((col("f1") && col("f2") && col("f3")).cast("long")).as("s3"))
    agg.select(expr(
      "stack(4, '0_all', total, 0L, " +
        "'1_length', s1, total - s1, " +
        "'2_min_words', s2, s1 - s2, " +
        "'3_repetition', s3, s2 - s3) AS (stage, survivors, dropped_here)"))
      .orderBy("stage")
  }

  /** B52b — per-document curation lineage: the ROW-LEVEL complement to
    * [[filterFunnel]]'s aggregate report. For every document, the list of
    * funnel stages it fails (independently — a doc can fail several) and
    * the final keep flag, computed from the SAME [[funnelFlags]] definition
    * the funnel and the B61 weak-supervision labels share, so the three
    * views can never drift. This is the provenance record a curation
    * pipeline ships with a training-data release: "why is doc X absent"
    * becomes a lookup, not a re-run, and per-stage counts reconcile against
    * the funnel by construction (CurationSpec pins both reconciliations).
    *
    * One fused scan, zero shuffle (the ORDER BY is verification-only):
    * the flags are pure column arithmetic over text, so at 100 TB this
    * runs at scan speed and writes one narrow lineage table.
    */
  def curationLineage(spark: SparkSession, dir: String,
                      minChars: Long = 100, maxChars: Long = 20000,
                      minWords: Int = 30, maxRep: Double = 0.07): DataFrame = {
    val (p1, p2, p3) = funnelFlags(minChars, maxChars, minWords, maxRep)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      concat_ws(",",
        when(!p1, lit("length")),
        when(!p2, lit("min_words")),
        when(!p3, lit("repetition"))).as("fail_stages"),
      (p1 && p2 && p3).as("keep"))
      .orderBy("doc_id")
  }

  /** B8f (r17) — the Gopher rule battery (Rae et al. 2021,
    * arXiv:2112.11446 Appendix A1.1): the published threshold filter every
    * production pretraining pipeline implements first, as a per-document
    * rule report — each rule's statistic, the list of failed rules, and
    * the keep flag. Distinct from B8's continuous quality score and B8d's
    * z-score ensemble: this is the REPRODUCIBLE named-threshold battery
    * (50 ≤ words ≤ 100k; 3 ≤ mean word length ≤ 10; '#' and '…'/'...'
    * symbol-to-word ratios ≤ 0.1; ≤ 90% bullet-started lines; ≤ 30%
    * ellipsis-ended lines; ≥ 80% of words contain a letter; ≥ 2 distinct
    * English stopwords of Gopher's 8) a release can cite.
    *
    * Engine-exact by construction: every statistic is integer counting —
    * words are maximal non-whitespace runs (ADVICE r17 #1: whitespace =
    * space/tab/newline/CR, so tokens no longer fuse across the newlines
    * the line rules target; the oracle's list_filter(string_split_regex(
    * text, '[ \t\n\r]'), x -> x <> '') is the identical segmentation),
    * the word-length SUM is the code-point count of the words themselves,
    * symbol counts are replace-length differences (both engines replace
    * non-overlapping left-to-right), distinct-stopword presence is
    * lowercase per-word equality, and each ratio rounds to 6 dp BEFORE
    * its threshold compare so the boundary is bit-identical cross-engine.
    *
    * Scale shape (r18, VERDICT r17 #2): ZERO shuffle, zero joins, and no
    * interpreted HOF array materialization — every sufficient statistic
    * derives from ONE [[VectorExpressions.gopherStats]] scan per row (the
    * D1 kernel pattern: TokenEntropyStats/NgramCounts family, replacing
    * the two `filter(split(text, …))` interpreted passes measured at
    * 2.31× the anchor at 50×); the rest of the plan is a pure projection
    * and the ORDER BY is verification-only. The degenerate-corpus
    * contract (single-line symbol-free docs compute exact zeros, never
    * nulls) is exercised by CurationSpec's crafted fixtures.
    */
  /** The Gopher stopword list (Rae et al. 2021 A1.1). */
  private[graft] val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The battery's stat columns derived from one GopherStats struct — the
    * ONE definition both the standalone report and the pipeline stage read
    * (the B52/B61 shared-definition discipline).
    */
  private[graft] def gopherStatCols(g: Column): Seq[(String, Column)] = {
    val nWords = g.getField("n_words")
    val nLines = g.getField("n_lines")
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> round(g.getField("word_chars").cast("double") / nWords, 6),
      "hash_ratio" -> round(g.getField("n_hash").cast("double") / nWords, 6),
      "ellipsis_ratio" -> round(g.getField("n_ellipsis").cast("double") / nWords, 6),
      "bullet_frac" -> round(g.getField("n_bullet_lines").cast("double") / nLines, 6),
      "ellipsis_end_frac" -> round(g.getField("n_ell_end_lines").cast("double") / nLines, 6),
      "alpha_frac" -> round(g.getField("n_alpha_words").cast("double") / nWords, 6),
      "n_stopwords" -> g.getField("n_stop_distinct"))
  }

  /** The eight named rules over the battery's stats — `stat` binds each
    * stat name to whatever column expression the caller's frame carries
    * (the report binds projected columns; the pipeline binds the `_g`
    * struct fields directly), so both gates apply literally the same
    * thresholds.
    */
  private[graft] def gopherRuleCols(stat: String => Column): Seq[(String, Column)] = Seq(
    "word_count" -> stat("n_words").between(50L, 100000L),
    "mean_word_len" -> stat("mean_word_len").between(3.0, 10.0),
    "hash_ratio" -> (stat("hash_ratio") <= 0.1),
    "ellipsis_ratio" -> (stat("ellipsis_ratio") <= 0.1),
    "bullet_lines" -> (stat("bullet_frac") <= 0.9),
    "ellipsis_lines" -> (stat("ellipsis_end_frac") <= 0.3),
    "alpha_words" -> (stat("alpha_frac") >= 0.8),
    "stopwords" -> (stat("n_stopwords") >= 2L))

  def gopherRulesOf(docs: DataFrame): DataFrame = {
    val stats = docs
      .withColumn("_g", VectorExpressions.gopherStats(col("text"), gopherStops))
      .select(col("doc_id") +:
        gopherStatCols(col("_g")).map { case (n, c) => c.as(n) }: _*)
    val rules = gopherRuleCols(col)
    stats
      .withColumn("fail_rules",
        concat_ws(",", rules.map { case (n, r) => when(!r, lit(n)) }: _*))
      .withColumn("keep", rules.map(_._2).reduce(_ && _))
      .orderBy("doc_id")
  }

  /** [[gopherRulesOf]] over the corpus documents table. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables.documents(spark, dir))

  /** B17 — pseudonymization: stable sha256 pseudonym for the user key (same
    * user → same pseudonym, not reversible without the pepper) and numeric
    * PII-pattern redaction in the free-form payload. Pure projection — at
    * 100 TB this runs at scan speed with zero shuffle.
    */
  def pseudonymize(spark: SparkSession, dir: String,
                   pepper: String = "pepper:"): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        substring(sha2(concat(lit(pepper), col("user_id").cast("string")), 256), 1, 16)
          .as("user_pseud"),
        col("event_type"),
        regexp_replace(col("props"), "\\d+", "<NUM>").as("props_redacted"))
      .orderBy("event_id")
}
