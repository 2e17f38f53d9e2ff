package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table (SURVEY.md §2 B7-B10).
  *
  * All pure narrow projections built from codegen'd builtins (`split`,
  * `transform`, `aggregate`, `regexp_*`) — no UDFs, so every operator stays
  * inside whole-stage codegen and scales embarrassingly parallel: at 100 TB
  * these run at parquet scan speed with zero shuffle (the final ORDER BY
  * exists only for deterministic verification output).
  */
object TextAnalysis {

  /** Tiny English stopword set for the language heuristic. */
  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  private def toks(c: Column): Column = split(c, " ")

  /** B9 — token counting: whitespace tokens plus a BPE-ish segmentation
    * (word pieces vs punctuation) via regexp extraction.
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0)")).cast("long").as("bpeish_tokens"),
        length(col("text")).cast("long").as("n_chars_computed")
      )
      .orderBy("doc_id")

  /** B7 — language ID: stopword-hit-ratio heuristic. A token-level filter
    * against a constant set — a codegen'd lambda, no join.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(enStop.map(lit): _*)
    val tokens = toks(lower(col("text")))
    val hits = size(filter(tokens, t => array_contains(stopArr, t)))
    val ratio = hits.cast("double") / size(tokens).cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("lang").as("lang_declared"),
        hits.cast("long").as("stopword_hits"),
        size(tokens).cast("long").as("n_tokens"),
        round(ratio, 6).as("stopword_ratio"),
        when(ratio > 0.04, "en").otherwise("und").as("lang_pred")
      )
      .orderBy("doc_id")
  }

  /** B8 — quality scoring: length, token, punctuation and repetition signals
    * combined into one score. Integer-ratio doubles are IEEE-exact, so the
    * oracle agrees bit-for-bit.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val tokens = toks(col("text"))
    val nTok = size(tokens).cast("double")
    val nUniq = size(array_distinct(tokens)).cast("double")
    val meanTokLen = (length(col("text")).cast("double") - (nTok - lit(1.0))) / nTok
    val uniqRatio = nUniq / nTok
    val score = round(least(lit(1.0), nTok / lit(200.0)) * uniqRatio, 6)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("n_chars"),
        size(tokens).cast("long").as("n_tokens"),
        round(meanTokLen, 6).as("mean_token_len"),
        round(uniqRatio, 6).as("uniq_token_ratio"),
        score.as("quality_score"),
        (score >= 0.3).as("keep")
      )
      .orderBy("doc_id")
  }

  /** B10 — document fingerprinting: winnowing-style rolling fingerprint —
    * hash every k-token shingle, keep the minimum (and the document-level
    * hash). md5 is used as the shingle hash because it is deterministic and
    * engine-portable; the production path can swap in xxhash64 via the same
    * shape. Pure per-row array ops, no shuffle.
    */
  def fingerprint(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val tokens = toks(col("text"))
    val nShingle = greatest(size(tokens) - lit(k - 1), lit(1))
    val shingleHashes = transform(
      sequence(lit(1), nShingle),
      i => md5(concat_ws(" ", slice(tokens, i, lit(k)))))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("doc_hash"),
        array_min(shingleHashes).as("min_shingle_hash"),
        nShingle.cast("long").as("n_shingles")
      )
      .orderBy("doc_id")
  }
}
