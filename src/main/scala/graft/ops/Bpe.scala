package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE vocabulary learning (SURVEY.md §2 B37) — the Sennrich
  * et al. 2016 byte-pair-encoding merge procedure, the tokenizer-training
  * step of an LLM data pipeline (TextAnalysis.tokenCount APPLIES a
  * tokenizer; this LEARNS one from the corpus).
  *
  * The algorithm is inherently iterative (merge k is defined on the state
  * after merge k-1), so the structure mirrors the repo's other driver-
  * iterative builders (Dedup.dupClusters): construction is lazy behind a
  * [[graft.plans.DeferredFrame]], the rounds run at the first action, and
  * the driver only ever holds the learned merge list (k rows).
  *
  * Scale shape — the key fact is that BPE's sufficient statistic is the
  * WORD-TYPE frequency table, not the corpus:
  *
  *  1. ONE corpus pass builds `(word, freq)` via a map-side-combined
  *     groupBy — the only corpus-sized computation. Everything after runs
  *     on the vocabulary (10⁷-10⁸ rows for a web corpus — distributed but
  *     ~10⁴× smaller than the text), which is also why this is EXACT where
  *     production trainers subsample: the frequency table is the lossless
  *     compression of the corpus for this algorithm.
  *  2. Each round: adjacent-pair counts weighted by word freq — a typed
  *     flatMap + partial-aggregated groupBy over the vocab — and the
  *     argmax pair via TakeOrdered(1) (freq desc, then lexicographic —
  *     deterministic under any partitioning; no global sort).
  *  3. The winning pair is greedily merged left-to-right in every word's
  *     symbol array (vocab-sized map). Each round's table is persisted and
  *     its predecessor released, so round t reads round t-1's cache, never
  *     the re-derived chain.
  *
  * Stops early when no pair reaches `minPairFreq` (merging singletons
  * teaches nothing and destabilizes ties). Output: one row per learned
  * merge — rank, left, right, merged, freq — tiny by construction.
  *
  * Not DuckDB-oracled: the learn loop is an iterative argmax-and-rewrite,
  * outside SQL; the spec instead replays an independent single-machine BPE
  * implementation on the collected frequency table and demands identical
  * merge sequences.
  */
object Bpe {

  /** End-of-word sentinel (Sennrich's `</w>`): merges cannot cross word
    * boundaries and a word-final symbol is distinct from the same symbol
    * mid-word.
    */
  val EndOfWord = "</w>"

  /** Vocab size up to which [[learnFrom]] runs its merge rounds on the
    * driver — the same bounded-collect budget as the dup-cluster
    * union-find's 64k edge cap (ops/Dedup.scala): ≤64k word types is a
    * few MB of symbol arrays, and the local loop replaces one distributed
    * job per merge round with microseconds of hashing.
    */
  val LocalVocabCap = 65536L

  val mergesSchema: StructType = StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("left", StringType, nullable = true),
    StructField("right", StringType, nullable = true),
    StructField("merged", StringType, nullable = true),
    StructField("freq", LongType, nullable = false)))

  /** Greedy left-to-right application of one merge to one symbol array —
    * the standard BPE rewrite ("aaa" under (a,a) → ["aa", "a"]).
    */
  def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `merges` BPE merges from the documents table. Lazy: rounds run
    * at the first action on the returned frame.
    */
  def learn(spark: SparkSession, dir: String, merges: Int = 32,
            minPairFreq: Long = 2L): DataFrame =
    graft.plans.DeferredFrame(spark, mergesSchema)(() =>
      learnFrom(Tables.documents(spark, dir).select(col("text")), merges, minPairFreq))

  /** The eager learn loop over any single-string-column frame.
    *
    * The word-frequency pass is Catalyst (map-side-combined groupBy over
    * the corpus — the one data-sized computation); the MERGE ROUNDS run on
    * a plain RDD. Deliberately so: a Dataset formulation chains one typed
    * map per round into an ever-deeper logical plan, and re-analyzing /
    * cache-matching that growing plan made round cost blow up superlinearly
    * past ~10 rounds (measured: 8 merges ≈ 2 s, 16 merges ≈ 38 s at
    * sf0.001 — pure planning, data-independent). The RDD loop has no plan
    * to re-derive: each round is one map-side-combined `reduceByKey` plus a
    * `takeOrdered(1)` argmax and a narrow rewrite map, constant cost per
    * round (16 merges ≈ 3 s). This is the "genuine per-partition iterative
    * logic" case the RDD escape hatch exists for.
    *
    * `localVocabCap` exists for the spec that pins local ≡ distributed
    * (pass 0 to force the RDD loop); production callers take the default.
    */
  def learnFrom(texts: DataFrame, merges: Int, minPairFreq: Long,
                localVocabCap: Long = LocalVocabCap): DataFrame = {
    val spark = texts.sparkSession
    import spark.implicits._
    val wordFreq = texts
      .select(explode(split(col(texts.columns.head), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // initial state: each word as its character symbols + the terminal
    var words: org.apache.spark.rdd.RDD[(Seq[String], Long)] =
      wordFreq.as[(String, Long)].rdd
        .map { case (w, f) => (w.map(_.toString).toList :+ EndOfWord: Seq[String], f) }
        .persist()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    // The loop state is one row per word TYPE — vocabulary-sized, not
    // corpus-sized. When the vocab fits the same 64k driver bound the
    // dup-cluster union-find uses (Dedup.scala), run the merge rounds
    // LOCALLY: each distributed round costs one 2-stage job (~45 ms of
    // pure scheduling at bench SF — profiled as ~60% of the whole
    // bpe_learn wall, and the r13 0.76→1.25 s drift was this per-job floor
    // riding the host's latency band), while the local loop over a ≤64k
    // table costs microseconds and computes the IDENTICAL argmax (same
    // (-freq, l, r) ordering, same minPairFreq stop — BpeSpec pins
    // equality against an independent implementation). Above the bound the
    // distributed loop stands: a 100 TB corpus's vocab is exactly what
    // must not be collected. The count doubles as the cache-materializing
    // action either way.
    val vocabN = words.count()
    if (vocabN <= localVocabCap) {
      var local = words.collect()
      words.unpersist()
      var rankL = 1L
      var doneL = false
      while (rankL <= merges && !doneL) {
        val stats = scala.collection.mutable.HashMap.empty[(String, String), Long]
        local.foreach { case (syms, f) =>
          var i = 0
          while (i + 1 < syms.length) {
            val k = (syms(i), syms(i + 1))
            stats.update(k, stats.getOrElse(k, 0L) + f)
            i += 1
          }
        }
        val best = stats.toSeq
          .sortBy { case ((l, r), f) => (-f, l, r) }.headOption
        best match {
          case Some(((l, r), f)) if f >= minPairFreq =>
            learned += ((rankL, l, r, l + r, f))
            local = local.map { case (syms, fr) => (applyMerge(syms, l, r), fr) }
            rankL += 1
          case _ => doneL = true
        }
      }
      return spark.createDataFrame(
        spark.sparkContext.parallelize(learned.toSeq.map {
          case (rk, l, r, m, f) => org.apache.spark.sql.Row(rk, l, r, m, f)
        }, numSlices = 1), mergesSchema)
    }
    // the round-(t-1) RDD stays cached until round t's stats action has
    // MATERIALIZED the round-t RDD from it (this round's rewrite reads the
    // cache, not the re-derived chain back to the corpus); released one
    // round late, so at most two vocab-sized caches coexist
    var prev: Option[org.apache.spark.rdd.RDD[(Seq[String], Long)]] = None
    var rank = 1L
    var done = false
    while (rank <= merges && !done) {
      // pair stats: one map-side-combined reduceByKey over the vocab, then
      // a takeOrdered(1) argmax — freq desc, lexicographic tie-break, so
      // the winner is independent of partitioning. This action also fills
      // the current round's cache.
      val best = words.flatMap { case (syms, f) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => ((a, b), f) }
      }.reduceByKey(_ + _)
        .takeOrdered(1)(Ordering.by { case ((l, r), f) => (-f, l, r) })
        .headOption
      prev.foreach(_.unpersist())
      prev = None
      best match {
        case Some(((l, r), f)) if f >= minPairFreq =>
          learned += ((rank, l, r, l + r, f))
          prev = Some(words)
          words = words.map { case (syms, fr) => (applyMerge(syms, l, r), fr) }.persist()
          rank += 1
        case _ => done = true
      }
    }
    words.unpersist()
    prev.foreach(_.unpersist())
    spark.createDataFrame(
      spark.sparkContext.parallelize(learned.toSeq.map {
        case (rk, l, r, m, f) => org.apache.spark.sql.Row(rk, l, r, m, f)
      }, numSlices = 1), mergesSchema)
  }

  /** Encode one word (symbol seq with terminal) under a rank-ordered merge
    * list — the standard BPE apply: merges in learned order, each greedy
    * left-to-right.
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString).toList :+ EndOfWord
    merges.foreach { case (l, r) => if (syms.length > 1) syms = applyMerge(syms, l, r) }
    syms
  }

  /** B37b — encode the corpus under a learned merge list: per-doc subword
    * token counts, the statistic a token-budget pipeline actually consumes
    * (B9's regex count approximates it; this is the real tokenizer the
    * corpus trained).
    *
    * Scale shape: learning is the expensive step and happens ONCE ([[learn]]
    * — or its result read from a table); this apply pass ships the KB-sized
    * merge list as a broadcast-style closure constant and encodes in one
    * narrow mapPartitions with a per-partition word→tokens memo — corpus
    * words repeat heavily (that is why BPE works), so each partition pays
    * the k-merge rewrite once per word TYPE it sees, not per occurrence.
    * No shuffle at all until the caller aggregates.
    */
  def encode(spark: SparkSession, dir: String, merges: Int = 16,
             minPairFreq: Long = 2L): DataFrame =
    graft.plans.DeferredFrame(spark, encodeSchema) { () =>
      val docs = Tables.documents(spark, dir)
      val mergeList = learnFrom(docs.select(col("text")), merges, minPairFreq)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      encodeWith(docs, mergeList)
    }

  val encodeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("n_words", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("tokens_per_word", DoubleType, nullable = true)))

  /** B58 — tokenizer fertility report: per language, tokens-per-word and
    * chars-per-token under the corpus-trained BPE — the tokenizer-efficiency
    * readout a multilingual training run budgets by (a language whose
    * fertility is 2× pays 2× the sequence length for the same text; that is
    * a cost AND a quality signal about vocabulary fit). Composes the
    * REGISTERED encode pass ([[encode]]'s own per-doc frame, not a copy)
    * joined to the corpus language labels and collapsed to language
    * cardinality with map-side partials; ratios divide exact longs once at
    * the end. Rows-only like the bpe family (the merge loop is not SQL) —
    * BpeSpec's independent single-machine replay is the correctness
    * anchor, and the fertility spec replays this aggregate from that
    * verified per-doc output.
    */
  def fertility(spark: SparkSession, dir: String, merges: Int = 16,
                minPairFreq: Long = 2L): DataFrame =
    graft.plans.DeferredFrame(spark, fertilitySchema) { () =>
      val docs = Tables.documents(spark, dir)
      val mergeList = learnFrom(docs.select(col("text")), merges, minPairFreq)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      encodeWith(docs, mergeList)
        .join(docs.select(col("doc_id"), col("lang"), col("n_chars")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("n_words"), 6).as("tokens_per_word"),
          round(col("n_chars").cast("double") / col("n_tokens"), 6).as("chars_per_token"))
        .orderBy("lang")
    }

  val fertilitySchema: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = true),
    StructField("n_docs", LongType, nullable = false),
    StructField("n_words", LongType, nullable = true),
    StructField("n_tokens", LongType, nullable = true),
    StructField("tokens_per_word", DoubleType, nullable = true),
    StructField("chars_per_token", DoubleType, nullable = true)))

  /** The eager apply pass over (doc_id, text) under a fixed merge list. */
  def encodeWith(docs: DataFrame, mergeList: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        rows.map { case (id, text) =>
          val ws = text.split(" ").filter(_.nonEmpty)
          var toks = 0L
          ws.foreach { w =>
            toks += memo.getOrElseUpdate(w, encodeWord(w, mergeList).length)
          }
          (id, ws.length.toLong, toks,
            if (ws.isEmpty) None
            else Some(math.rint(toks.toDouble / ws.length * 1e6) / 1e6))
        }
      }
      .toDF("doc_id", "n_words", "n_tokens", "tokens_per_word")
      .orderBy("doc_id")
  }
}
