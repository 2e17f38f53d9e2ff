package graft.ops

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  def trainSplit(spark: SparkSession, dir: String,
                 trainFrac: Double = 0.9, valFrac: Double = 0.05): DataFrame = {
    val u = conv(substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 6), 16, 10)
      .cast("long")
    val trainCut = (trainFrac * (1 << 24)).toLong
    val valCut = ((trainFrac + valFrac) * (1 << 24)).toLong
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        when(u < trainCut, "train").when(u < valCut, "val").otherwise("test").as("split"))
      .orderBy("doc_id")
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

  /** B13 — benchmark-contamination check: which corpus docs share at least
    * `minOverlap` distinct 8-gram shingles with an eval-set doc (the
    * standard n-gram-overlap decontamination test). The eval set here is a
    * deterministic sample (doc_id % 50 == 0) standing in for a benchmark
    * table; the join is keyed on the shingle hash, so only docs that
    * actually share an 8-gram ever meet. At 100 TB the eval side is tiny
    * (benchmarks are KBs) and broadcasts.
    */
  def contamination(spark: SparkSession, dir: String, shingleK: Int = 8,
                    minOverlap: Int = 3): DataFrame = {
    val hashed = Tables.documents(spark, dir).select(col("doc_id"),
      explode(VectorExpressions.shingleHashes(col("text"), shingleK, md5Based = true)
        .getField("hv")).as("h"))
    val eval_ = hashed.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_id"), col("h"))
    val corpus = hashed.where(col("doc_id") % 50 =!= 0)
      .select(col("doc_id").as("corpus_id"), col("h"))
    corpus.join(broadcast(eval_), Seq("h"))
      .groupBy("eval_id", "corpus_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minOverlap)
      .orderBy("eval_id", "corpus_id")
  }
}
