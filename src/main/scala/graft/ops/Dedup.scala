package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the documents table (SURVEY.md §2 B1-B4).
  *
  * Scale discipline: nothing here ever compares all pairs. Exact dedup
  * groups on a content hash; near-dup generates candidates only inside LSH
  * buckets (MinHash bands / SimHash chunks) and verifies only those
  * candidates. At 100 TB the only shuffles are hash-partition-by-band-key
  * and the final candidate join — both linear in data size for bounded
  * bucket width (salt or re-band if a bucket explodes).
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** B1 — exact dedup: keep the first doc_id per identical text. Grouping on
    * md5(text) (not the raw text) keeps shuffle rows narrow; the surviving
    * rows come back via a ranked window over the hash — equivalent to
    * groupBy+min+semijoin but one shuffle instead of two.
    */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val byHash = Window.partitionBy(col("text_hash")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("text_hash", md5(col("text")))
      .withColumn("rn", row_number().over(byHash))
      .where(col("rn") === 1)
      .select("doc_id", "lang", "source", "n_chars", "text_hash")
      .orderBy("doc_id")
  }

  /** B1b — dedup group stats: copies per distinct content. */
  def exactStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("n_chars")).as("total_chars")
      )
      .orderBy("keep_id")

  // -------------------------------------------------------------- minhash

  /** Token k-shingles of the text (distinct, as the MinHash set elements). */
  private def shingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(split(text, " ")) - lit(k - 1), lit(1))),
      i => concat_ws(" ", slice(split(text, " "), i, lit(k)))))

  /** Engine-portable universal hash family used by the oracle-checked
    * MinHash path: each shingle is hashed ONCE to a 24-bit base value
    * (md5 prefix, parseable identically by Spark's `conv` and DuckDB's
    * '0x' cast), then the i-th hash is the linear congruence
    * (a_i * base + b_i) mod P — classic universal hashing, so the MinHash
    * bound holds, and only |shingles| md5 calls happen per row instead of
    * k*|shingles|. The coefficients are deterministic (fixed LCG) and
    * shared verbatim with the generated oracle SQL.
    */
  val MinhashP = 16777213L // prime < 2^24; products stay < 2^44 (no overflow in any engine)
  def minhashCoefs(k: Int): Seq[(Long, Long)] = {
    var x = 42L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); (x >>> 40) % (MinhashP - 1) + 1 }
    Seq.fill(k)((next(), next()))
  }

  /** B2 (oracle path) — MinHash signatures + LSH band keys per document.
    * The signature component is min over shingles of the i-th universal
    * hash; bands concatenate r adjacent components and re-hash. Per-row
    * array math only — the expensive part (banding join) happens on these
    * keys downstream.
    */
  def minhashSignature(spark: SparkSession, dir: String,
                       numHashes: Int = 16, bands: Int = 4, shingleK: Int = 3): DataFrame = {
    val r = numHashes / bands
    val coefs = minhashCoefs(numHashes)
    val sh = shingles(col("text"), shingleK)
    val sigCols = coefs.map { case (a, b) =>
      array_min(transform(col("hashed"), h => (h * a + b) % MinhashP))
    }
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|", slice(col("sig"), lit(b * r + 1), lit(r)))).as(s"band_$b")
    }
    Tables.documents(spark, dir)
      .withColumn("hashed", transform(sh, s => conv(substring(md5(s), 1, 6), 16, 10).cast("long")))
      .withColumn("n_shingles", size(col("hashed")).cast("long"))
      .withColumn("sig", array(sigCols: _*))
      .select(col("doc_id") +: col("n_shingles") +: bandCols: _*)
      .orderBy("doc_id")
  }

  /** B2 (scale path) — LSH candidate pairs via explode-on-band + self-join
    * on (band index, band key), then MinHash-estimated Jaccard from
    * signature agreement. xxhash64-based hash family (codegen'd, no md5
    * string churn). Never all-pairs: the join key is the band bucket.
    */
  def minhashPairs(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                   shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val r = numHashes / bands
    // One codegen'd xxhash64 per shingle, masked to 24 bits; the k-hash
    // family is the same bounded linear congruence as the oracle path
    // (products < 2^48, so no ANSI-mode overflow).
    val coefs = minhashCoefs(numHashes)
    val sigCols = coefs.map { case (a, b) =>
      array_min(transform(col("hashed"), h => (h * a + b) % MinhashP))
    }
    val signed = docs
      .withColumn("hashed",
        transform(shingles(col("text"), shingleK), s => xxhash64(s).bitwiseAND(lit(0xFFFFFFL))))
      .select(col("doc_id"), array(sigCols: _*).as("sig"))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key", xxhash64(col("band"), concat_ws("|", slice(col("sig"), col("band") * r + 1, lit(r)))))
    val a = signed.select(col("band"), col("band_key"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = signed.select(col("band"), col("band_key"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(numHashes.toDouble))
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** B2c — near-dup dedup decision: drop every doc that matched an earlier
    * doc in any LSH bucket (keep-first by doc_id).
    */
  def minhashDedup(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val dups = minhashPairs(docs, threshold = threshold)
      .select(col("id_b").as("doc_id")).distinct()
    docs.join(dups, Seq("doc_id"), "left_anti")
  }

  // -------------------------------------------------------------- simhash

  /** B3 — SimHash: 64-bit fingerprint from per-token xxhash64 bit votes;
    * near-dups share a fingerprint chunk (4×16-bit bands) and are verified
    * by Hamming distance. Bit votes via bitwise ops on codegen'd hashes.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val sim = (0 until 64).map { bit =>
      val vote = aggregate(col("thashes"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << bit)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    docs
      .withColumn("thashes", transform(split(col("text"), " "), t => xxhash64(t)))
      .select(col("doc_id"), sim.as("simhash"))
      .withColumn("chunk0", col("simhash").bitwiseAND(lit(0xFFFFL)))
      .withColumn("chunk1", shiftright(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)))
      .withColumn("chunk2", shiftright(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)))
      .withColumn("chunk3", shiftright(col("simhash"), 48).bitwiseAND(lit(0xFFFFL)))
  }

  /** B3b — SimHash candidate pairs: equal 16-bit chunk ⇒ candidate (catches
    * all pairs within Hamming distance 3 by pigeonhole); verify by exact
    * Hamming distance on the full fingerprint.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val chunks = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(i => struct(lit(i).as("chunk_id"), col(s"chunk$i").as("chunk_val"))): _*)).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.chunk_id"), col("c.chunk_val"))
    val a = chunks.select(col("chunk_id"), col("chunk_val"), col("doc_id").as("id_a"), col("simhash").as("sim_a"))
    val b = chunks.select(col("chunk_id"), col("chunk_val"), col("doc_id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk_id", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // -------------------------------------------------- n-gram Jaccard verify

  /** B4 — exact n-gram Jaccard on candidate pairs only. Candidates here come
    * from cheap blocking (same source + length bucket) to exercise the
    * verify stage with an oracle; the LSH paths above plug their candidate
    * sets into the same verification shape. The intersection is computed
    * with an explicit distinct+filter (portable semantics across engines).
    */
  def ngramJaccard(spark: SparkSession, dir: String, shingleK: Int = 3): DataFrame = {
    // Intersect on 60-bit md5-prefix hashes of the shingles rather than the
    // strings: set sizes are unchanged (collisions ~ |sh|²/2^61 ≈ 0) and the
    // candidate-pair intersect stops hashing long strings. The same hashing
    // is reproduced in the DuckDB oracle ('0x'||substr(md5)::BIGINT).
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), expr("n_chars div 100").as("len_bucket"),
        transform(shingles(col("text"), shingleK),
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("sh"))
    val a = docs.select(col("source"), col("len_bucket"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("source"), col("len_bucket"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = size(col("sh_a")).cast("double") + size(col("sh_b")).cast("double") - inter
    a.join(b, Seq("source", "len_bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(inter / union, 6).as("jaccard"))
      .where(col("jaccard") >= 0.05)
      .orderBy("id_a", "id_b")
  }
}
