package graft.ops

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline runs after cleaning
  * and dedup (SURVEY.md §2 B11-B13). All three are narrow or keyed-join
  * shapes that hold at 100 TB:
  *  - split assignment is a pure projection (scan-speed, zero shuffle);
  *  - corpus stats is a partial-aggregated groupBy on a low-cardinality key;
  *  - contamination joins on shingle hashes — candidates meet only on
  *    shared n-grams, never all-pairs.
  */
object Corpus {

  /** B11 — deterministic train/val/test split: a content-free hash of the
    * doc id lands each doc in a stable bucket; fractions are exact 24-bit
    * thresholds. Same doc → same split on every run, every engine (md5
    * prefix parses identically in DuckDB), resumable and join-free.
    */
  /** The ONE split-assignment expression, shared by [[trainSplit]] and
    * [[splitDivergence]]: the KL diagnostic only means anything if it
    * measures exactly the split the splitter assigns — two hand-copied
    * hash/cut computations could drift one edit at a time.
    */
  private def splitCol(trainFrac: Double, valFrac: Double): org.apache.spark.sql.Column = {
    val u = DocHash.hash24("split:")
    val trainCut = (trainFrac * (1 << 24)).toLong
    val valCut = ((trainFrac + valFrac) * (1 << 24)).toLong
    when(u < trainCut, "train").when(u < valCut, "val").otherwise("test")
  }

  def trainSplit(spark: SparkSession, dir: String,
                 trainFrac: Double = 0.9, valFrac: Double = 0.05): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        splitCol(trainFrac, valFrac).as("split"))
      .orderBy("doc_id")

  /** B11c — LEAKAGE-FREE train/val/test split: assign splits at DUPLICATE-
    * CLUSTER granularity, not per document. B11's per-doc hash split puts
    * two near-identical docs in different splits with probability
    * 2·p·(1−p) each — exactly the cross-split leakage B11b
    * ([[splitLeakage]]) measures and a held-out eval cannot survive (the
    * model "generalizes" to a paraphrase of its own training data). Here
    * every doc hashes on its near-dup CLUSTER id (B19's components;
    * singletons on their own doc_id), so a whole duplicate family lands in
    * ONE split BY CONSTRUCTION — near-dup leakage at the clustering
    * threshold is structurally zero, and for singletons the assignment is
    * bit-identical to [[trainSplit]] (same `split:` hash prefix), so
    * adopting the fix reshuffles only the clustered minority.
    *
    * Scale shape: B19's machinery end to end (banded LSH pairs, bounded
    * label propagation) + one hash-keyed left join to attach cluster ids +
    * the same integer-exact 24-bit cut as B11. The DuckDB oracle replays
    * the identical recursive-CTE clusters + md5 cut.
    */
  def clusterSplit(spark: SparkSession, dir: String,
                   trainFrac: Double = 0.9, valFrac: Double = 0.05): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "source")
    val clusters = Dedup.dupClusters(spark, dir).select("doc_id", "cluster_id")
    val keyed = docs.join(clusters, Seq("doc_id"), "left_outer")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
    val u = conv(substring(md5(concat(lit("split:"), col("split_key").cast("string"))),
      1, 6), 16, 10).cast("long")
    val trainCut = (trainFrac * (1 << 24)).toLong
    val valCut = ((trainFrac + valFrac) * (1 << 24)).toLong
    keyed.select(col("doc_id"), col("lang"), col("source"), col("split_key"),
      when(u < trainCut, "train").when(u < valCut, "val").otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  /** B39 — split-distribution divergence: the KL divergence between every
    * ordered pair of train/val/test unigram distributions (add-k smoothed
    * over the JOINT vocabulary so every term is defined) — the QA number
    * that catches a skewed split before a wasted training run: a
    * hash-random split should show near-zero divergences, a
    * time/source-correlated one lights up.
    *
    * Shapes: one token explode feeds a partial-aggregated (split, token)
    * count whose persisted frame then derives totals, the joint
    * vocabulary, and both sides of the scoring join; the vocab×splits
    * probability grid attaches totals through a bounded
    * (splits-by-construction) broadcast and V as a 1-row scalar; the
    * pair scoring is a token-keyed self-join partial-aggregated into 6
    * rows. Nothing is all-pairs in the corpus dimension; text never
    * shuffles. Float budget identical to lmPerplexity (exact ln
    * arguments; summation-order error orders below the round-6 step).
    *
    * Deliberately NOT the NgramCounts kernel reshape (r18, VERDICT r17
    * #4 adjudication): unlike lm_perplexity's groupBy(doc, gram) — a
    * corpus-scale exchange the kernel kills — this aggregate keys on
    * (split, token): ≤ 3·|V| cells that ALREADY collapse in the codegen'd
    * map-side partial agg, so the exchange is KBs either way. The kernel
    * variant was measured SLOWER at the 50× crossover (2.38 s vs 1.72 s
    * quiet-host: its CodegenFallback breaks the explode out of
    * whole-stage codegen and allocates a per-row struct array, buying
    * nothing the partial agg hadn't). The residual >2× ratio is the
    * vocab_top floor argument: a single explode+count pass over the same
    * corpus measures 1.2 s on its own (4.9× its anchor), so the entire KL
    * machinery costs ~0.5 s above the one-counting-pass floor — a
    * JVM-vs-columnar scan constant, not plan waste.
    */
  def splitDivergence(spark: SparkSession, dir: String,
                      trainFrac: Double = 0.9, valFrac: Double = 0.05,
                      addK: Double = 0.5): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(splitCol(trainFrac, valFrac).as("split"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("split", "w").agg(count(lit(1)).as("cnt"))
      .persist() // feeds totals + vocab + both scoring sides; Caches.clear releases
    val totals = counts.groupBy("split").agg(sum(col("cnt")).as("n"))
    val vocabSize = counts.select(count_distinct(col("w")).as("vocab"))
    val grid = counts.select("w").distinct()
      // splits are a construction constant (≤3 rows) — bounded broadcast,
      // same class as ann_brute's probe set
      .crossJoin(broadcast(totals))
    val p = grid.join(counts, Seq("split", "w"), "left_outer")
      .crossJoin(broadcast(vocabSize))
      .select(col("split"), col("w"), col("n"),
        ((coalesce(col("cnt"), lit(0L)) + lit(addK)) /
          (col("n") + lit(addK) * col("vocab"))).as("p"))
    p.select(col("split").as("split_a"), col("w"), col("n").as("n_a"), col("p").as("pa"))
      .join(p.select(col("split").as("split_b"), col("w"), col("n").as("n_b"),
        col("p").as("pb")), Seq("w"))
      .where(col("split_a") =!= col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(max(col("n_a")).as("n_tokens_a"), max(col("n_b")).as("n_tokens_b"),
        round(sum(col("pa") * log(col("pa") / col("pb"))), 6).as("kl"))
      .orderBy("split_a", "split_b")
  }

  /** B42 — DSIR-style importance selection (Xie et al. 2023,
    * arXiv:2302.03169): score every candidate document by how much more
    * likely its tokens are under a TARGET distribution than under the raw
    * corpus distribution, and keep the top-k — the "select raw data that
    * looks like the high-quality target" step (DSIR selects pretraining
    * data resembling Wikipedia; here the target is the held-out `val`
    * split, the same deterministic md5 split the splitter assigns, so the
    * whole pipeline stays content-free-reproducible). Features are
    * unigrams with add-k smoothing over the raw vocabulary (DSIR uses
    * hashed n-grams; unigrams keep the oracle exact and the shape is
    * identical — swap the explode for a hash expression to widen).
    * Deterministic variant of the paper's Gumbel-top-k: rank by the
    * per-token average log importance ratio (length-normalized so short
    * docs don't win by variance), ties broken by doc_id.
    *
    * Scale shape (mirrors [[splitDivergence]] + lmPerplexity): one token
    * explode feeds a persisted per-(doc, token) partial-aggregated count;
    * target and raw unigram tables both derive from it (the explode runs
    * once); totals and vocabulary attach as 1-row broadcast scalars; the
    * log-ratio table is vocabulary-bounded and joins token-keyed; the
    * final top-k is TakeOrdered, never a global sort. Float budget as
    * lmPerplexity: the ln argument is a quotient of correctly-rounded
    * divides of exact integers+0.5 — identical bits on both engines.
    */
  def dsirSelect(spark: SparkSession, dir: String, k: Int = 100,
                 trainFrac: Double = 0.9, valFrac: Double = 0.05,
                 addK: Double = 0.5): DataFrame = {
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), splitCol(trainFrac, valFrac).as("split"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "lang", "split", "w").agg(count(lit(1)).as("cnt"))
      .persist() // feeds raw + target counts AND the scoring join; Caches.clear releases
    val raw = perDoc.groupBy("w").agg(sum(col("cnt")).as("cr"))
    val tgt = perDoc.where(col("split") === "val")
      .groupBy("w").agg(sum(col("cnt")).as("ct"))
    // raw covers every token (target ⊆ corpus), so V = |raw| is the joint vocab
    val scalars = raw.agg(sum(col("cr")).as("nr"), count(lit(1)).as("vocab"))
      .crossJoin(broadcast(tgt.agg(sum(col("ct")).as("nt"))))
    val lr = raw.join(tgt, Seq("w"), "left_outer")
      .crossJoin(broadcast(scalars))
      .select(col("w"),
        log(((coalesce(col("ct"), lit(0L)) + lit(addK)) / (col("nt") + lit(addK) * col("vocab"))) /
          ((col("cr") + lit(addK)) / (col("nr") + lit(addK) * col("vocab")))).as("lr"))
    perDoc.where(col("split") =!= "val") // candidates: the pool outside the target
      .join(lr, Seq("w"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("cnt")).as("n_tokens"), sum(col("cnt") * col("lr")).as("s"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        round(col("s") / col("n_tokens"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** B12 — corpus composition stats per (lang, source): doc/token/char
    * volumes and mean doc length — the dashboard numbers a data curation
    * run reports. One partial-aggregated shuffle on a tiny key space.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        round(sum(size(split(col("text"), " ")).cast("long")).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_doc_tokens")
      )
      .orderBy("lang", "source")

  /** B13e — MEMORIZATION-RISK scoring: per document, the count and fraction
    * of its distinct n-grams that are corpus-RARE (document frequency ≤
    * `maxDf`). A doc dominated by sequences nothing else in the corpus
    * contains is the verbatim-memorization risk extraction attacks target
    * (Carlini-style: rare long n-grams are what a model can only emit by
    * memorizing THIS document) — the inverse of the contamination lens:
    * B13 asks "does training data contain the eval set", this asks "which
    * training docs would be attributable if regurgitated". High-risk docs
    * are the ones to dedup hardest, audit for PII, or down-weight.
    *
    * Same machinery as the dedup family: distinct n-gram hashes per doc
    * from the codegen'd ShingleHashes pass, one explode → df groupBy
    * (map-side partials absorb common grams), one hash join back. At
    * 100 TB the df table is the shared shingle universe B51/B57 already
    * build — maintainable as an index; nothing here is corpus-quadratic.
    */
  def memorizationRisk(spark: SparkSession, dir: String, n: Int = 8,
                       maxDf: Long = 2L): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(VectorExpressions.shingleHashes(col("text"), n, md5Based = true)
          .getField("hv")).as("hv"))
    // df via a count window over the gram hash instead of groupBy + join
    // back: the join formulation scans and re-hashes the corpus TWICE (both
    // join inputs are the same exploded pipeline); the window pays the same
    // one shuffle on hv but reads the corpus once (measured 9.2 → 2.7 s at
    // 50×, flipping the family from 2.5× slower to 0.76× vs the anchor). hv is high-cardinality, so partitions stay tiny (a pathological
    // hot gram is the dedup family's guarded case, not this report's).
    val byGram = Window.partitionBy(col("hv"))
    grams.withColumn("df", count(lit(1)).over(byGram))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("df") <= maxDf, 1L).otherwise(0L)).cast("long").as("n_rare"))
      .select(col("doc_id"), col("n_grams"), col("n_rare"),
        round(col("n_rare").cast("double") / col("n_grams").cast("double"), 6)
          .as("risk"))
      .orderBy("doc_id")
  }

  /** B22 — corpus vocabulary: per-token corpus frequency (tf) and document
    * frequency (df), deterministic top-k by tf — the counting pass a
    * tokenizer/BPE training run makes over the corpus. Two-level
    * aggregation: (doc, token) counts collapse map-side before the first
    * shuffle, the second groupBy shuffles at most one row per distinct
    * (doc, token), and the top-k is TakeOrdered — no global sort at 100 TB.
    */
  def vocabTop(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
      .groupBy("token").agg(sum("cnt").as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(k)

  /** B22b — corpus n-gram diversity curve (r15): for n = 1..4, total gram
    * occurrences, corpus-wide distinct grams, and their ratio — the
    * type-token curve that reads corpus health in four numbers: unigram
    * diversity is vocabulary richness, and how fast the ratio falls with n
    * separates template-heavy corpora (4-gram diversity stays low — the
    * same phrases everywhere, self-BLEU's warning) from naturally varied
    * text. The per-n gram pass is the codegen'd positional-hash scan (no
    * per-gram lambda — this repo's measured 20× trap), occurrences counted
    * positionally (NOT per-doc-distinct), distincts as one corpus-wide
    * count over the 60-bit hashes (collision odds ~|grams|²/2⁶¹ ≈ 0, the
    * ngramJaccard argument; the oracle replays the identical md5 prefix).
    * Four scans, each a partial-aggregated count + distinct on a narrow
    * hash column; sub-n docs are excluded per n (they carry no full gram).
    */
  def ngramDiversity(spark: SparkSession, dir: String, maxN: Int = 4): DataFrame =
    (1 to maxN).map { n =>
      Tables.documents(spark, dir)
        .where(size(split(col("text"), " ")) >= n)
        .select(explode(VectorExpressions.positionalShingleHashes(col("text"), n,
          md5Based = true)).as("h"))
        .groupBy(lit(n).as("n"))
        .agg(count(lit(1)).as("total_ngrams"),
          countDistinct(col("h")).as("distinct_ngrams"))
        .withColumn("diversity",
          round(col("distinct_ngrams").cast("double") / col("total_ngrams"), 6))
    }.reduce(_.unionByName(_)).orderBy("n")

  /** B22c — out-of-vocabulary rate (r15): per doc, the fraction of tokens
    * outside the corpus' top-`vocabSize` vocabulary (composing [[vocabTop]]
    * with its exact tie rule, so the rate audits the SAME vocabulary the
    * tokenizer pass reports) — the coverage question a fixed-vocab
    * tokenizer asks of new data: a doc mostly OOV is foreign to the
    * vocabulary (wrong language, encoding junk, domain shift) and a rising
    * corpus-level OOV rate is drift. The vocabulary is top-K (KBs at any
    * corpus size) and broadcasts; the token explode partial-aggregates
    * per doc map-side. Registered at vocabSize=16 so the stand-in corpus
    * (~31 types) yields a real fraction spread.
    *
    * ZERO corpus-wide shuffles (r17 — the r16 shape composed [[vocabTop]]
    * verbatim and then re-exploded the same corpus for scoring: two full
    * tokenizes + corpus-wide (doc, token) exchanges, 6.35× the anchor at
    * 50×). Two passes, neither shuffling anything doc-scale:
    *
    *  1. VOCAB: per-doc distinct token counts derive MAP-SIDE
    *     ([[graft.functions.VectorExpressions.ngramCounts]], n=1 — no
    *     groupBy(doc, token) exchange exists), partial-aggregate to
    *     vocabulary-cardinality rows per partition, and the top-`vocabSize`
    *     cut (vocabTop's exact tf DESC + token tie rule) collects to the
    *     driver — `vocabSize` strings, the documented bounded-collect
    *     class (IVF centroids, union-find edges). At 100 TB the vocabulary
    *     shuffle is KBs per partition; the collect is KBs total.
    *  2. SCORE: the vocab rides back as [[graft.functions.VectorExpressions
    *     .termFrequencies]]'s term list, so per-doc in-vocab occurrences
    *     (Σ tf) and total tokens (dl) come out of ONE row-local scan — the
    *     scoring "join" is a pure projection against a 16-entry literal;
    *     n_oov = dl − Σ tf is the left-anti arithmetic bit-for-bit.
    */
  def oovRate(spark: SparkSession, dir: String, vocabSize: Int = 16): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(graft.functions.VectorExpressions
        .ngramCounts(col("text"), 1)).as("g"))
      .groupBy(col("g.g").as("token")).agg(sum(col("g.c")).as("tf"))
      .orderBy(col("tf").desc, col("token"))
      .limit(vocabSize)
      .select("token").collect().map(_.getString(0)).toSeq
    Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.VectorExpressions
        .termFrequencies(col("text"), vocab).as("tc"))
      .select(col("doc_id"), col("tc.dl").as("n_tokens"),
        (col("tc.dl") - expr("aggregate(tc.tf, 0L, (a, x) -> a + x)")).as("n_oov"))
      .withColumn("oov_frac",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
      .orderBy("doc_id")
  }

  /** B54 — heavy hitters under fixed memory (Misra-Gries, the mergeable
    * frequent-items summary): top-k tokens by estimated count where no
    * executor ever holds more than `m` counters — the sketch that answers
    * "what dominates this corpus" when the vocabulary itself does not fit
    * (token vocab at 100 TB is ~billions of byte-sequences; C22's exact
    * vocab_top shuffles all of it, this shuffles ≤ m rows per partition).
    *
    * Per-partition Misra-Gries: increment a held counter, admit while
    * capacity remains, else decrement ALL m counters (the arriving token is
    * absorbed unstored) — each decrement round retires m+1 token
    * occurrences, so a partition's undercount is ≤ nₚ/(m+1) and, summing,
    * the merged estimate satisfies `exact − N/(m+1) ≤ est ≤ exact`: any
    * token with frequency above N/(m+1) is GUARANTEED present. The merge is
    * a partial-aggregated groupBy over ≤ m·P summary rows (the standard
    * mergeability result for MG summaries), and the top-k is TakeOrdered.
    *
    * The registered oracle is EXACT top-k by count, valid because the gate
    * corpus' per-partition distinct-token count sits far under the default
    * m = 256 — MG never decrements, so the sketch degrades to exact
    * counting (documented oracle condition, like the approx-sketch
    * registrations C9/C15 but stronger: exact-match rather than rows-only
    * while the condition holds). The approximate path — where MG actually
    * evicts — is exercised by CorpusSpec with m = 4 against a planted
    * skew corpus, asserting both sides of the error bound.
    */
  def heavyHitters(spark: SparkSession, dir: String,
                   m: Int = 256, k: Int = 50): DataFrame = {
    import spark.implicits._
    val toksDs = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w")).as[String]
    val partials = toksDs.mapPartitions { it =>
      // Offset-amortized Misra-Gries (ADVICE r11): the logical
      // decrement-all is `offset += 1` — a counter's effective count is
      // stored − offset, and a key is dead once stored ≤ offset — so an
      // eviction round removes only the DEAD keys instead of rebuilding
      // all m live counters. The eviction sweep is still O(m), but each
      // round retires exactly m units of admitted mass (every resident key
      // holds effective ≥ 1 — dead keys never survive a sweep) while the
      // whole stream admits ≤ n units, so rounds ≤ n/m and the pass is
      // O(n) amortized with an O(1)-per-arrival hot path. Estimates are
      // bit-identical to textbook MG: offset increment ≡ decrement-all,
      // dead-key removal ≡ zero removal, and the triggering arrival is
      // not admitted either way.
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      var offset = 0L
      it.foreach { w =>
        cnt.get(w) match {
          case Some(cur) => cnt(w) = cur + 1
          case None if cnt.size < m => cnt(w) = offset + 1
          case None =>
            offset += 1
            cnt.filterInPlace((_, v) => v > offset)
        }
      }
      cnt.iterator.map { case (k, v) => (k, v - offset) }
    }.toDF("w", "est")
    partials.groupBy("w").agg(sum(col("est")).as("est"))
      .orderBy(col("est").desc, col("w"))
      .limit(k)
  }

  /** B54b — Count-Min sketch point-frequency estimation, the mergeable
    * complement to [[heavyHitters]]: Misra-Gries answers "what dominates"
    * with k counters; Count-Min answers "how often is THIS key" for EVERY
    * key, in `d·w` counters with one-sided error (never under, over by at
    * most ε·N with probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉ — Cormode &
    * Muthukrishnan '05). The sketch is LINEAR — CM(A⊎B) = CM(A)+CM(B)
    * cell-wise — so partitions sketch independently and merge by summing,
    * which here is literally one `groupBy(row, bucket).count` whose
    * map-side partials ARE the per-partition sketches; at 100 TB the
    * shuffle is d·w rows per mapper regardless of key cardinality (the
    * exact vocab groupBy shuffles the vocabulary). Hashes are md5-prefix
    * rows (engine-portable, deterministic), so unlike the HLL/GK sketch
    * siblings the WHOLE approximation replays bit-exact in DuckDB — the
    * oracle builds the same sketch from grouped counts (linearity again)
    * and must land on identical estimates, not just bounded ones.
    *
    * The registered report probes the full (bounded) stand-in vocabulary:
    * per token, its exact count, the CM estimate, and the one-sided
    * overestimate. In production the probe set is whatever keys the
    * consumer asks about; exactness of `exact_n` is affordable only
    * because the probe vocabulary is bounded — the SKETCH never needs it.
    */
  def countMinFreq(spark: SparkSession, dir: String,
                   d: Int = 4, w: Int = 256,
                   fromInstances: Boolean = false): DataFrame = {
    def buckets = array((0 until d).map { i =>
      conv(substring(md5(concat(lit(s"$i:"), col("token"))), 1, 15), 16, 10)
        .cast("long") % w
    }: _*)
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    val grouped = toks.groupBy("token").agg(count(lit(1)).as("exact_n")).persist()
    // Two provably identical builds (linearity: CM(A⊎B) = CM(A)+CM(B)):
    //  - fromInstances: every token instance lands in d cells, partial-agg
    //    collapses each partition to <= d*w rows before the shuffle — the
    //    UNBOUNDED-key-space path (shingles at 100 TB), where grouping the
    //    keys first is exactly the shuffle CM exists to avoid;
    //  - grouped (default): the registered report already pays the vocab
    //    groupBy for its exact_n column, so the sketch sums the grouped
    //    counts — d·|vocab| rows instead of d·N (measured 2.3s -> floor at
    //    50x). Equality of the two builds is the linearity proof, spec-pinned.
    val sketch =
      if (fromInstances)
        toks.select(posexplode(buckets).as(Seq("i", "bucket")))
          .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))
      else
        grouped.select(col("exact_n"), posexplode(buckets).as(Seq("i", "bucket")))
          .groupBy("i", "bucket").agg(sum(col("exact_n")).as("cnt"))
    val probes = grouped
      .select(col("token"), col("exact_n"), posexplode(buckets).as(Seq("i", "bucket")))
    probes.join(sketch, Seq("i", "bucket"))
      .groupBy("token", "exact_n")
      .agg(min(col("cnt")).as("cm_est"))
      .select(col("token"), col("exact_n"), col("cm_est"),
        (col("cm_est") - col("exact_n")).as("overestimate"))
      .orderBy("token")
  }

  /** B22d — Zipf rank-frequency fit: the least-squares slope of
    * ln(count) on ln(rank) over the token vocabulary — the one-number
    * answer to "does this corpus have a natural-language frequency
    * profile?" (clean text sits near −1; templated/synthetic corpora
    * flatten toward 0, encoding junk steepens). A curation pipeline
    * tracks the slope per source/snapshot as a cheap drift alarm beside
    * B60's χ² and B12's composition stats.
    *
    * Scale shape: the vocab groupBy partial-aggregates map-side (token
    * explode never shuffles raw text); the ranking window and the moment
    * sums run over VOCAB-cardinality rows (the bounded-aggregate global
    * window this board whitelists — same class as novelty_curve's
    * cumulative sum); output is one row. `ln` composition follows the
    * B53 BM25 precedent: both engines' libm agree through the 6-dp round
    * on integer-argument logs.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
    val moments = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      sum(log(col("rank").cast("double"))).as("sx"),
      sum(log(col("cnt").cast("double"))).as("sy"),
      sum(log(col("rank").cast("double")) * log(col("cnt").cast("double"))).as("sxy"),
      sum(log(col("rank").cast("double")) * log(col("rank").cast("double"))).as("sxx"))
    moments.select(
      col("n").cast("long").as("n_types"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
      round((col("sy") - col("sx") *
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"), 6)
        .as("intercept"))
  }

  /** B23 — per-document salient terms: top-k tokens by a rarity-weighted
    * score, `cnt · N / df` — tf·idf with a LINEAR idf. The linear form is
    * deliberate: it is integer-ratio double math, IEEE-exact on every
    * engine, where `ln` is library-dependent in the last ulp and would make
    * the oracle flaky at rounding boundaries. Shapes: one (doc, token)
    * partial-aggregated count, a token-keyed join against the df table, a
    * broadcast scalar for N, and a per-doc ranked window.
    */
  def topTerms(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val dfTable = counts.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
    counts.join(dfTable, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("cnt").cast("double") * col("n_docs") / col("df"), 6))
      .withColumn("term_rank", row_number().over(byDoc).cast("long"))
      .where(col("term_rank") <= k)
      .select("doc_id", "term_rank", "token", "score")
      .orderBy("doc_id", "term_rank")
  }

  /** B24 — sequence chunking: split each document into fixed-size token
    * windows with overlap (stride = window − overlap) — the packing step
    * that turns cleaned documents into training sequences. Chunk count is
    * integer-exact (`(n − overlap + stride − 1) div stride`, floor of 1) so
    * both engines derive identical chunks; the explode is a pure per-row
    * widening at scan speed — no shuffle at any corpus size.
    */
  def chunk(spark: SparkSession, dir: String,
            window: Int = 64, overlap: Int = 8): DataFrame =
    chunksOf(Tables.documents(spark, dir), window, overlap)
      .orderBy("doc_id", "chunk_id")

  /** Frame-level chunking body shared by [[chunk]] and
    * [[Dedup.passageDedup]] (which re-chunks with overlap 0 so every token
    * belongs to exactly one passage). Unordered: callers sort or aggregate.
    */
  def chunksOf(docs: DataFrame, window: Int, overlap: Int): DataFrame = {
    require(overlap < window, "overlap must be smaller than the window")
    val stride = window - overlap
    val tok = split(col("text"), " ")
    val nchunks = greatest(lit(1L),
      expr(s"(size(split(text, ' ')) - $overlap + ${stride - 1}) div $stride"))
    docs
      .select(col("doc_id"), tok.as("tok"), nchunks.as("nch"))
      .select(col("doc_id"), col("tok"),
        explode(sequence(lit(0L), col("nch") - 1)).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        size(slice(col("tok"), (col("chunk_id") * stride + 1).cast("int"), lit(window)))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("tok"), (col("chunk_id") * stride + 1).cast("int"), lit(window)))
          .as("chunk_text"))
  }

  /** B68 — content-defined chunking (token-level Rabin/Gear style): split
    * each document at positions where the hash of the trailing `k`-gram ≡
    * 0 (mod `divisor`) — boundaries decided by CONTENT, not offsets, so an
    * edit re-synchronizes at the next boundary instead of shifting every
    * following window. This is what fixed-stride chunking (B24) cannot
    * give: insert one token near the front of a near-duplicate and every
    * B24 window after it changes, hiding the shared tail from passage
    * dedup; CDC boundaries downstream of the edit land on the same grams,
    * so the shared chunks stay byte-identical ([[graft.ops.Dedup
    * .cdcPassageDedup]] exploits exactly that). Expected chunk length ≈
    * `divisor` tokens; a cut after the LAST token is vacuous and excluded
    * (no empty chunks), and docs of ≤ k tokens are one whole-doc chunk.
    *
    * Scale shape: boundaries, starts, and slices are all array functions
    * over the one positional-hash pass B34/B67 already price — a pure
    * per-row widening at scan speed, NO shuffle at any corpus size (the
    * registered query's orderBy is presentation only). The 60-bit
    * md5-prefix gram hash is the oracle-portable family, so DuckDB replays
    * boundary decisions bit-for-bit.
    */
  def cdcChunk(spark: SparkSession, dir: String,
               k: Int = 3, divisor: Int = 16): DataFrame =
    cdcChunksOf(Tables.documents(spark, dir), k, divisor)
      .orderBy("doc_id", "chunk_id")

  /** Frame-level CDC body shared by [[cdcChunk]] and
    * [[graft.ops.Dedup.cdcPassageDedup]]. Unordered: callers sort or
    * aggregate.
    */
  def cdcChunksOf(docs: DataFrame, k: Int, divisor: Int): DataFrame = {
    require(k >= 1, "gram width must be positive")
    require(divisor >= 2, "divisor must be at least 2 (1 cuts after every token)")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("tok"),
        VectorExpressions.positionalShingleHashes(col("text"), k, md5Based = true).as("ph"))
      .withColumn("n", size(col("tok")).cast("long"))
      // cut after token p (1-based) ⇔ the k-gram ENDING at p (= ph index
      // p−k+1) hashes to 0 mod divisor, for p in [k, n−1]. The n > k guard
      // keeps the sequence ascending AND the ph index in range (a sub-k
      // doc carries one clamped whole-text gram that must not cut).
      .withColumn("cuts", when(col("n") > k,
        filter(sequence(lit(k.toLong), col("n") - 1L), p =>
          pmod(element_at(col("ph"), (p - k + 1).cast("int")), lit(divisor.toLong)) === 0L))
        .otherwise(expr("CAST(array() AS array<bigint>)")))
      .withColumn("starts", concat(array(lit(1L)), transform(col("cuts"), _ + 1L)))
      .withColumn("ends", concat(col("cuts"), array(col("n"))))
      .select(col("doc_id"), col("tok"),
        posexplode(zip_with(col("starts"), col("ends"),
          (s, e) => struct(s.as("s"), e.as("e")))))
      .select(
        col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_id"),
        col("col.s").as("first_pos"),
        (col("col.e") - col("col.s") + 1L).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("tok"), col("col.s").cast("int"),
          (col("col.e") - col("col.s") + 1L).cast("int"))).as("chunk_text"))
  }

  /** B30 — document packing (GPT-style concat-and-cut): assign each doc a
    * position in a fixed-token-budget training pack. Docs concatenate in
    * deterministic (shard, doc_id) order; a doc's pack is the budget
    * window containing its START offset (docs crossing a boundary overflow
    * their pack — the standard simple packing; the trainer's loader cuts
    * sequences, this op decides placement).
    *
    * Scale shape: a global concat order would serialize the corpus through
    * one sort, so docs first land in `shards` deterministic content-free
    * shards (md5 of doc_id — NOT doc_id ranges, which would correlate with
    * ingest order); the running-offset window then runs per shard —
    * `shards` independent sorted partitions, each a fraction of the
    * corpus, exactly how a 1000-executor packing job wants to run. All
    * integer math, engine-exact.
    */
  def docPacking(spark: SparkSession, dir: String,
                 budget: Long = 2048, shards: Int = 8): DataFrame = {
    val shard = DocHash.hash24("pack:") % shards
    // ROWS frame: doc_id is unique, so ROWS ≡ RANGE but streams instead of
    // paying the default RANGE frame's peer-group scan per row.
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), shard.as("shard"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .withColumn("start_off", sum(col("ntok")).over(w) - col("ntok"))
      .select(col("doc_id"), col("shard"), col("ntok"), col("start_off"),
        expr(s"start_off div ${budget}L").as("pack_id"),
        expr(s"start_off % ${budget}L").as("pack_off"))
      .orderBy("doc_id")
  }

  /** B30b — packing-efficiency report (r15): per shard, the numbers a
    * training run reads before committing to a packing configuration —
    * docs, tokens, sequence (pack) count, fill ratio (the concat-and-cut
    * layout fills every pack to `budget` except each shard's open tail,
    * so fill = total/(n_packs·budget) and the headroom is the tail), and
    * the BOUNDARY-CROSSING doc count/fraction: docs whose tokens straddle
    * a pack cut get split across training sequences, the fragmentation a
    * larger budget or document-aware packing trades against. Composes the
    * registered [[docPacking]] layout (same budget/shard math — one
    * definition, no drift) and collapses to `shards` rows map-side; all
    * integer math plus two integer-ratio rounded divides, engine-exact.
    */
  def packingEfficiency(spark: SparkSession, dir: String,
                        budget: Long = 2048, shards: Int = 8): DataFrame =
    docPacking(spark, dir, budget, shards)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        sum(when(col("pack_off") + col("ntok") > budget, 1L).otherwise(0L))
          .as("crossing_docs"))
      .withColumn("n_packs", expr(s"(total_tokens + ${budget - 1}L) div ${budget}L"))
      .withColumn("fill_ratio",
        round(col("total_tokens").cast("double") / (col("n_packs") * budget), 6))
      .withColumn("crossing_frac",
        round(col("crossing_docs").cast("double") / col("n_docs"), 6))
      .select(col("shard"), col("n_docs"), col("total_tokens"), col("n_packs"),
        col("fill_ratio"), col("crossing_docs"), col("crossing_frac"))
      .orderBy("shard")

  /** B30c — document-aware (no-split) packing via harmonic size classes
    * (r15): the alternative [[packingEfficiency]]'s crossing fraction prices
    * — concat-and-cut fills every sequence but splits the docs that straddle
    * a cut; this layout never splits a piece across sequences, trading a
    * bounded amount of tail headroom for intact documents. The algorithm is
    * the classic harmonic bin-packing scheme chosen because it is CLOSED
    * FORM — no first-fit scan state, so it distributes: a piece of size s
    * joins class m = budget div s (the count of that size that fits in one
    * pack), and each class-m pack takes m consecutive pieces. No-crossing is
    * then an arithmetic invariant (m pieces of size ≤ budget/m sum ≤
    * budget), and every FULL pack is provably > budget·m/(m+1) filled
    * (class-m sizes exceed budget/(m+1)); only the last pack per
    * (shard, class) is open. Docs longer than the budget split into
    * full-budget pieces (each lands in class 1 and fills its pack exactly —
    * the unavoidable split) plus one remainder piece that re-enters its own
    * class; within a doc, pieces tile 0..n-1 with the remainder last.
    *
    * Plan shape: one documents scan → piece explode (usually 1 row out per
    * row in) → a row_number window per (shard, class) → a running-sum
    * window per (shard, class, pack). Two fine-grained exchanges of the
    * pieces table, both keyed well below shard granularity; `shards` is the
    * parallelism knob exactly as in [[docPacking]], and no window ever
    * holds more than one (shard, class) slice. All integer math
    * (content-free md5 shard, integer division classes), engine-exact.
    */
  def harmonicPacking(spark: SparkSession, dir: String,
                      budget: Long = 64, shards: Int = 8): DataFrame = {
    val b = budget
    val pieces = Tables.documents(spark, dir)
      .select(col("doc_id"), (DocHash.hash24("hpack:") % shards).as("shard"),
        size(split(col("text"), " ")).cast("long").as("dtok"))
      // piece count = full budget-size pieces + one remainder piece if any;
      // dtok ≥ 1 always (split of "" is a 1-element array) so ≥ 1 piece
      .withColumn("piece", explode(expr(
        s"sequence(0L, dtok div ${b}L + (CASE WHEN dtok % ${b}L > 0 THEN 1L ELSE 0L END) - 1L)")))
      .withColumn("ntok",
        when(col("piece") < expr(s"dtok div ${b}L"), lit(b))
          .otherwise(expr(s"dtok % ${b}L")))
      .withColumn("class_m", expr(s"${b}L div ntok"))
    val wRank = Window.partitionBy(col("shard"), col("class_m"))
      .orderBy(col("doc_id"), col("piece"))
    val wPack = Window.partitionBy(col("shard"), col("class_m"), col("pack_seq"))
      .orderBy(col("doc_id"), col("piece"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pieces
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("pack_seq", expr("(rn - 1L) div class_m"))
      .withColumn("pack_off", sum(col("ntok")).over(wPack) - col("ntok"))
      .select(col("doc_id"), col("piece"), col("shard"), col("ntok"),
        col("class_m"), col("pack_seq"), col("pack_off"))
      .orderBy("doc_id", "piece")
  }

  /** B11b — cross-SPLIT leakage check (r15): which (train, holdout) doc
    * pairs share at least `minOverlap` distinct k-gram shingles under
    * [[trainSplit]]'s assignment — the audit run between splitting and
    * training, because a near-duplicate that lands in train AND val/test
    * inflates every eval number it touches. B13 screens against an
    * external benchmark; this screens the corpus against its own holdout,
    * and shares [[splitCol]] with the splitter so it audits EXACTLY the
    * split that ships (the B39 discipline).
    *
    * The holdout is a constant FRACTION of the corpus, so unlike B13's
    * eval side neither join input is small — what bounds the shingle join
    * is the document-frequency cap: shingles in more than `maxDf` docs are
    * boilerplate, not leakage signal (the standard decontamination move),
    * and dropping them caps any shingle's contribution at maxDf² pairs.
    * The viral set itself is tiny (only shingles OVER the cap), so the
    * filter is a left-anti join against a broadcast-sized frame. One
    * shingle-explode pass persisted for its three consumers (df count +
    * both sides — the B34/B67 discipline, released by graft.Caches.clear).
    */
  def splitLeakage(spark: SparkSession, dir: String, shingleK: Int = 8,
                   minOverlap: Int = 3, maxDf: Int = 50,
                   trainFrac: Double = 0.9, valFrac: Double = 0.05): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), splitCol(trainFrac, valFrac).as("split"),
        explode(VectorExpressions.shingleHashes(col("text"), shingleK, md5Based = true)
          .getField("hv")).as("h"))
      .persist()
    val viral = sh.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select("h")
    val ok = sh.join(viral, Seq("h"), "left_anti")
    val train = ok.where(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("h"))
    val holdout = ok.where(col("split") =!= "train")
      .select(col("doc_id").as("holdout_id"), col("split").as("holdout_split"), col("h"))
    train.join(holdout, Seq("h"))
      .groupBy("train_id", "holdout_id", "holdout_split")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minOverlap)
      .orderBy("train_id", "holdout_id")
  }

  /** B13 — benchmark-contamination check: which corpus docs share at least
    * `minOverlap` distinct 8-gram shingles with an eval-set doc (the
    * standard n-gram-overlap decontamination test). The eval set here is a
    * deterministic sample (doc_id % 50 == 0) standing in for a benchmark
    * table; the join is keyed on the shingle hash, so only docs that
    * actually share an 8-gram ever meet. The eval side is NOT hinted
    * broadcast: here it is a fixed FRACTION of the corpus (doc_id % 50),
    * which scales with the data — AQE broadcasts it while it is small and
    * falls back to a keyed shuffle when it is not. (A real benchmark table
    * — KBs, fixed size — could safely take the hint; this stand-in can't.)
    *
    * `hashed` — the full-corpus shingle explode, the dominant cost — is
    * persisted lazily: it feeds BOTH join sides, and unpersisted each side
    * re-ran the scan + ShingleHashes pass (same lesson as
    * Curation.boilerplateFraction). Released by graft.Caches.clear.
    */
  def contamination(spark: SparkSession, dir: String, shingleK: Int = 8,
                    minOverlap: Int = 3): DataFrame = {
    val hashed = Tables.documents(spark, dir).select(col("doc_id"),
      explode(VectorExpressions.shingleHashes(col("text"), shingleK, md5Based = true)
        .getField("hv")).as("h"))
      .persist()
    val eval_ = hashed.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_id"), col("h"))
    val corpus = hashed.where(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("corpus_id"), col("h"))
    corpus.join(eval_, Seq("h"))
      .groupBy("eval_id", "corpus_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minOverlap)
      .orderBy("eval_id", "corpus_id")
  }

  /** B13c — contamination SPAN report: for every corpus document, the
    * maximal token intervals covered by 8-grams that also occur in the
    * eval split — [[contamination]] says WHICH (eval, corpus) pairs share
    * content and how many grams; this says exactly WHERE in the training
    * doc the leak sits and how long it is, the artifact a decontamination
    * audit actually reviews (and what [[graft.ops.Dedup.dupSpanTrim]]-style
    * surgical removal would consume, vs B13b's whole-doc drop).
    *
    * Span semantics: matched gram STARTS merge while their k-token
    * coverage overlaps (a break needs a gap > k between consecutive
    * starts), so spans are precisely the maximal leaked token intervals —
    * disjoint, each separated by ≥ 1 clean token. Same islands shape as
    * B67 with a distance threshold instead of strict consecutiveness
    * (repeats need every L-gram dup; coverage only needs SOME leaked gram
    * per window). Eval docs shorter than k carry no full k-gram and are
    * excluded (B13's deduped clamped shingle for them has no position to
    * report).
    *
    * Scale shape: one positional-hash pass persisted for its two
    * consumers (eval-set build + corpus probe — the B34/B67 discipline);
    * the eval set is a distinct-collapsed hash join (eval splits are
    * small relative to the corpus — AQE broadcasts); runs are one per-doc
    * window over MATCHED positions only (leak-cardinality, not corpus-
    * cardinality).
    */
  def contaminationSpans(spark: SparkSession, dir: String,
                         shingleK: Int = 8): DataFrame = {
    val k = shingleK
    val st = Tables.documents(spark, dir)
      .where(size(split(col("text"), " ")) >= k)
      .select(col("doc_id"),
        posexplode(VectorExpressions.positionalShingleHashes(col("text"), k,
          md5Based = true)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
      .persist()
    val eval_ = st.where(col("doc_id") % 50 === 0).select("h").distinct()
    spansOver(st.where(col("doc_id") % 50 =!= 0), eval_, k)
  }

  /** B13c against a REAL benchmark table (r15, VERDICT r14 #6): the
    * registered query's `doc_id % 50` eval stand-in keeps the oracle
    * deterministic, but a production decontamination run screens the
    * corpus against an EXTERNAL eval set — `evalDocs` is any frame with a
    * `text` column (a loaded benchmark file, a curated prompt table).
    * Every corpus document is scored (no parity-slice exclusion); eval
    * rows shorter than k carry no full k-gram and contribute nothing,
    * same rule as the registered query. Same island construction, same
    * scale shape — the eval gram set is benchmark-sized and its join
    * side AQE-broadcasts.
    */
  def contaminationSpansAgainst(spark: SparkSession, dir: String,
                                evalDocs: DataFrame,
                                shingleK: Int = 8): DataFrame = {
    val k = shingleK
    val st = Tables.documents(spark, dir)
      .where(size(split(col("text"), " ")) >= k)
      .select(col("doc_id"),
        posexplode(VectorExpressions.positionalShingleHashes(col("text"), k,
          md5Based = true)).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    spansOver(st, evalGramSet(evalDocs, k), k)
  }

  /** The distinct k-gram hash set of an external eval table (`text`
    * column; sub-k rows excluded — no full k-gram exists in them).
    */
  private def evalGramSet(evalDocs: DataFrame, k: Int): DataFrame =
    evalDocs
      .where(size(split(col("text"), " ")) >= k)
      .select(explode(VectorExpressions.positionalShingleHashes(col("text"), k,
        md5Based = true)).as("h"))
      .distinct()

  /** The shared B13c island pass: corpus positional-gram starts joined
    * against an eval gram set, merged into maximal leaked token intervals
    * (break at start gap > k — disjoint spans, ≥ 1 clean token between).
    */
  private def spansOver(corpusSt: DataFrame, evalHashes: DataFrame,
                        k: Int): DataFrame = {
    val matched = corpusSt.join(evalHashes, Seq("h"))
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    matched
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) > k, 1).otherwise(0))
      .withColumn("grp", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"),
        col("n_grams"))
      .orderBy("doc_id", "span_start")
  }

  /** B13d — SURGICAL decontamination: remove from every corpus document
    * exactly the tokens covered by a leaked eval 8-gram — the act that
    * consumes [[contaminationSpans]]' report ([[decontaminated]] is the
    * blunt instrument: it drops the WHOLE doc once ≥N grams match, paying
    * all its clean tokens; this keeps them). n_removed per doc equals the
    * summed span lengths of the report by construction — the spec pins
    * that equality on the real corpus.
    *
    * Shapes: B34's coverage machinery with the dup set swapped for the
    * eval-gram set — token p is covered ⟺ a leaked gram starts in
    * [p−L+1, p] (one per-doc dense-position ROWS window), reassembly a
    * per-doc ordered collect. The doc-level (tok, ph) frame persists for
    * its two consumers (eval-set build + corpus flag join). Sub-k docs
    * pass through untrimmed on the corpus side and contribute no grams on
    * the eval side (consistent with [[contaminationSpans]]); eval rows are
    * not corpus members and do not appear in the output (B13b's rule).
    */
  def decontaminatedSpans(spark: SparkSession, dir: String,
                          shingleK: Int = 8): DataFrame = {
    val k = shingleK
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tok"),
        VectorExpressions.positionalShingleHashes(col("text"), k,
          md5Based = true).as("ph"))
      .withColumn("n", size(col("tok")))
      .persist()
    val ev = base.where(col("doc_id") % 50 === 0 && col("n") >= k)
      .select(explode(col("ph")).as("h")).distinct()
    trimOver(base.where(col("doc_id") % 50 =!= 0), ev, k)
  }

  /** B13d against a REAL benchmark table (r15, VERDICT r14 #6) — the
    * production seam matching [[contaminationSpansAgainst]]: surgically
    * trim from EVERY corpus document the tokens covered by a k-gram of
    * the external `evalDocs` (`text` column). Same coverage window, same
    * tiling guarantee vs the spans report.
    */
  def decontaminatedSpansAgainst(spark: SparkSession, dir: String,
                                 evalDocs: DataFrame,
                                 shingleK: Int = 8): DataFrame = {
    val k = shingleK
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tok"),
        VectorExpressions.positionalShingleHashes(col("text"), k,
          md5Based = true).as("ph"))
      .withColumn("n", size(col("tok")))
    trimOver(base, evalGramSet(evalDocs, k), k)
  }

  /** The shared B13d trim pass over a (doc_id, tok, ph, n) corpus frame
    * and an eval gram-hash set: B34's coverage window with the dup set
    * swapped for the leaked set; sub-k docs pass through untrimmed.
    */
  private def trimOver(base: DataFrame, evalHashes: DataFrame,
                       k: Int): DataFrame = {
    val ev = evalHashes.withColumn("is_leak", lit(1))
    // arrays_zip pads the shorter hash array with nulls (tail positions
    // where no gram starts); a sub-k doc's clamped whole-text gram is
    // nulled out too — it is not a full k-gram and must not match
    val corpusTok = base
      .select(col("doc_id"), col("n"),
        posexplode(arrays_zip(col("tok"), col("ph"))).as(Seq("p0", "z")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("z.tok").as("token"),
        when(col("n") >= k, col("z.ph")).otherwise(lit(null)).as("h"))
    val flagged = corpusTok.join(ev, Seq("h"), "left_outer")
      .select(col("doc_id"), col("pos"), col("token"),
        coalesce(col("is_leak"), lit(0)).as("d"))
    val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(k - 1), 0)
    val full = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    flagged
      .withColumn("covered", max(col("d")).over(w))
      .withColumn("n_tokens", count(lit(1)).over(full))
      .withColumn("n_removed", sum(col("covered")).over(full).cast("long"))
      .withColumn("clean_text", concat_ws(" ",
        collect_list(when(col("covered") === 0, col("token"))).over(full)))
      .where(col("pos") === 1)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("clean_text"))
      .orderBy("doc_id")
  }

  /** B51 — cross-source overlap matrix: for every source pair, how many
    * distinct 8-gram shingles they share, plus the Jaccard of their shingle
    * sets — the "is src7 a mirror of src3 / how much boilerplate do my
    * crawls share?" question a data-sourcing decision needs BEFORE
    * committing to dedup cost. Full-document hashes answer it only for
    * byte-exact mirrors; shingle overlap sees partial mirrors, shared
    * templates and quote-heavy sources too (same currency as B13's
    * contamination check).
    *
    * Shapes for 100 TB: the corpus collapses to distinct (source, shingle)
    * rows FIRST (partial-aggregated — a source's repeated boilerplate
    * collapses map-side), and the pair meet is keyed on the shingle hash —
    * never all-pairs of sources, never all-pairs of docs. Per-key join
    * width is the shingle's source count, capped at `maxSources`: a
    * shingle present in more sources than that is universal boilerplate —
    * it says nothing about PAIRWISE affinity but would contribute
    * O(maxSources²) rows per hash — so it is excluded from the overlap
    * universe on both engines (sizes and Jaccard are over the capped
    * universe, consistently). The distinct frame is persisted: it feeds
    * the per-source sizes AND both join sides (released by
    * [[graft.Caches]].clear).
    */
  def sourceOverlap(spark: SparkSession, dir: String, shingleK: Int = 8,
                    maxSources: Int = 64): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("source"),
        explode(VectorExpressions.shingleHashes(col("text"), shingleK, md5Based = true)
          .getField("hv")).as("h"))
      .distinct()
      .persist()
    val capped = sh.groupBy("h").agg(count(lit(1)).as("nsrc"))
      .where(col("nsrc") <= maxSources).select("h")
    // Persisted (r19, guide §2.4/§5): the capped universe feeds THREE
    // consumers — the per-source sizes and both self-join sides — and each
    // one re-ran the df-cap aggregate plus its join against the sh cache
    // (the before-plan shows the aggregate→broadcast→join block four
    // times). One materialization serves all three; released by
    // graft.Caches.clear like sh itself.
    val shc = sh.join(capped, Seq("h")).persist()
    val sizes = shc.groupBy("source").agg(count(lit(1)).as("n"))
    val pairs = shc.select(col("source").as("source_a"), col("h"))
      .join(shc.select(col("source").as("source_b"), col("h")), Seq("h"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("na"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared"),
        round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** B66 — corpus-accumulation novelty curve: sources in deterministic
    * acquisition order (ascending name — the stable proxy both engines
    * agree on), and for each source how many of its distinct 8-gram
    * shingles were NEVER seen in any earlier source — the "what does the
    * next crawl buy us" curve a data-acquisition plan reads. A source
    * whose novelty_rate is near zero duplicates the corpus it joins
    * (cut it before paying to process it); the cumulative column is the
    * corpus's distinct-shingle growth curve, the saturating-returns
    * evidence behind dedup-aware acquisition ordering.
    *
    * Scale shape: ONE distinct (source, shingle-hash) universe feeds both
    * sides (persisted — the same two-consumer pattern as sourceOverlap);
    * "first source to contribute h" is `min(source)` over that universe —
    * because acquisition rank IS name order, the min collapses map-side
    * with no rank table and no join back to data; per-source totals are a
    * second map-side collapse of the same frame. The cumulative sum is a
    * global window over the per-SOURCE aggregate (source cardinality, a
    * whitelisted bounded-input window like daily_trend). Shingles never
    * shuffle text: the universe carries (source, 64-bit hash) only.
    */
  def noveltyCurve(spark: SparkSession, dir: String, shingleK: Int = 8): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .select(col("source"),
        explode(VectorExpressions.shingleHashes(col("text"), shingleK, md5Based = true)
          .getField("hv")).as("h"))
      .distinct()
      .persist()
    val novel = sh.groupBy("h").agg(min(col("source")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("novel_shingles"))
    val out = sh.groupBy("source").agg(count(lit(1)).as("total_shingles"))
      .join(novel, Seq("source"), "left_outer")
      .select(col("source"), col("total_shingles"),
        coalesce(col("novel_shingles"), lit(0L)).as("novel_shingles"))
      .withColumn("novelty_rate",
        round(col("novel_shingles").cast("double") / col("total_shingles"), 6))
      .withColumn("cum_novel", sum(col("novel_shingles"))
        .over(Window.orderBy("source").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("source")
    out
  }

  /** B56 — corpus concentration report: how dominated is the corpus by its
    * largest sources — Herfindahl-Hirschman index over per-source char
    * volume (Σ shareᵢ², the standard concentration number), its inverse
    * (the "effective number of sources"), and top-1/top-k volume shares.
    * The one-row health check a data-sourcing review reads before any
    * per-source drilldown: HHI → 1 means one crawl IS the corpus and every
    * diversity assumption downstream is fiction.
    *
    * Deliberately sort-free where it can be: HHI and top-1 are pure
    * aggregates over the per-source table (which is itself a map-side
    * collapsed groupBy — source cardinality, not doc cardinality), so no
    * global rank exists anywhere in the plan except the top-k share, and
    * that is TakeOrdered over the SOURCE table (k rows retained per
    * partition, never a full sort). Gini needs a value-ordered global
    * prefix — HHI answers the same question without one; that trade is
    * this operator's scale design. Share divisions are exact-long /
    * exact-long doubles; Σvol² runs in doubles (vol² overflows long at
    * target scale), summation-order noise ~1e-13 ≪ the 6-dp step.
    */
  def sourceConcentration(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val per = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("vol"))
    val scal = per.agg(
      count(lit(1)).as("n_sources"),
      sum(col("n")).as("n_docs"),
      sum(col("vol")).as("total_chars"),
      max(col("vol")).as("max_vol"),
      sum(col("vol").cast("double") * col("vol").cast("double")).as("ss"))
    val topk = per.orderBy(col("vol").desc, col("source")).limit(topK)
      .agg(sum(col("vol")).as("topk_vol"))
    val total = col("total_chars").cast("double")
    scal.crossJoin(broadcast(topk))
      .select(col("n_sources"), col("n_docs"), col("total_chars"),
        round(col("max_vol").cast("double") / total, 6).as("top1_share"),
        round(col("topk_vol").cast("double") / total, 6).as("topk_share"),
        round(col("ss") / (total * total), 6).as("hhi"),
        round(total * total / col("ss"), 2).as("effective_sources"))
  }

  /** B60 — per-source language-mix drift: for each source, the chi-square
    * statistic of its language composition against the corpus-wide mix —
    * the "this crawler started ingesting the wrong site" alarm: a source
    * whose mix diverges hard from the corpus (or from its own historical
    * self — run on two snapshots and diff) is the first symptom of a
    * misconfigured scraper or an injected spam stream, visible long
    * before per-doc quality filters trip.
    *
    * χ² = Σ_lang (obs − exp)²/exp with exp = source_total · corpus_share.
    * Engine-exact float chain: obs and totals are exact longs; corpus
    * shares divide once; each term's (obs−exp)²/exp composes
    * correctly-rounded ops in a fixed order, summed over ≤ |langs| terms
    * before a round-6. Shapes: one (source, lang) partial-aggregated
    * count; corpus marginals collapse from it; the scoring join is
    * lang-keyed against a broadcast-sized marginal table; output is
    * source cardinality.
    */
  def sourceLangDrift(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("obs"))
      .persist() // feeds marginals AND the scoring join; Caches.clear releases
    val langTotals = counts.groupBy("lang").agg(sum(col("obs")).as("lang_n"))
    val grand = counts.agg(sum(col("obs")).as("n"))
    val srcTotals = counts.groupBy("source").agg(sum(col("obs")).as("src_n"))
    // FULL source × lang grid: a language the source never produced still
    // contributes its expected count to χ² (the zero-obs term IS the
    // drift evidence — dropping it understates exactly the worst drifts).
    // The cross is source-cardinality × the language inventory — bounded
    // by construction like ann_brute's probe set, not by data volume.
    val grid = srcTotals.crossJoin(broadcast(langTotals))
    grid.join(counts, Seq("source", "lang"), "left_outer")
      .crossJoin(broadcast(grand))
      .select(col("source"), col("src_n"),
        (coalesce(col("obs"), lit(0L)).cast("double") -
          col("src_n") * (col("lang_n").cast("double") / col("n"))).as("dev"),
        (col("src_n") * (col("lang_n").cast("double") / col("n"))).as("exp"))
      .groupBy("source")
      .agg(max(col("src_n")).as("n_docs"),
        round(sum(col("dev") * col("dev") / col("exp")), 6).as("chi_square"))
      .orderBy("source")
  }

  /** B13b — decontamination REMOVAL: the corpus with every doc flagged by
    * [[contamination]] dropped — check → remove as one operator, the step
    * an actual training run executes. The flagged set (already tiny: docs
    * sharing ≥ minOverlap 8-gram shingles with the eval sample) collapses
    * to distinct ids before a left-anti hash join against the corpus — the
    * join carries flagged-cardinality rows, the corpus side streams
    * through at scan speed.
    */
  def decontaminated(spark: SparkSession, dir: String, shingleK: Int = 8,
                     minOverlap: Int = 3): DataFrame = {
    val flagged = contamination(spark, dir, shingleK, minOverlap)
      .select(col("corpus_id").as("doc_id")).distinct()
    Tables.documents(spark, dir)
      .where(col("doc_id") % 50 =!= 0) // eval rows are not corpus members
      .select("doc_id", "lang", "source", "n_chars")
      .join(flagged, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  /** B62 — per-language sequence-length histogram: documents bucketed by
    * whitespace-token count (equi-width buckets of `bucketTokens`), with
    * each bucket's share of its language — the sequence-length budget
    * picture a training run sizes its context window, packing strategy
    * (B30), and per-language sampling from; a language whose mass sits in
    * the tail buckets needs different chunking than one that doesn't.
    *
    * Scale shape: ONE scan computes (lang, bucket) and collapses map-side
    * to histogram cardinality (languages × occupied buckets — bounded by
    * max document length, not corpus size); the lang-share window runs
    * over that already-tiny frame. Share is one integer-ratio division
    * rounded once (engine-exact).
    */
  def lengthHistogram(spark: SparkSession, dir: String, bucketTokens: Int = 16): DataFrame = {
    val hist = Tables.documents(spark, dir)
      .select(col("lang"),
        expr(s"CAST(size(split(text, ' ')) AS BIGINT) div $bucketTokens").as("bucket"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"))
    val byLang = Window.partitionBy(col("lang"))
    hist
      .select(col("lang"), (col("bucket") * bucketTokens).as("bucket_lo_tokens"),
        col("n_docs"),
        round(col("n_docs").cast("double") / sum(col("n_docs")).over(byLang), 6)
          .as("lang_share"))
      .orderBy("lang", "bucket_lo_tokens")
  }
}
