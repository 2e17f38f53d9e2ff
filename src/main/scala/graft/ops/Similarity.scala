package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (SURVEY.md §2 B5).
  *
  * Two paths:
  *  - brute-force top-k for a SMALL broadcast query set — the correctness
  *    baseline; a broadcast nested-loop over Q query vectors is a linear
  *    scan of the corpus and the right plan when |Q| is tiny (the 100 TB
  *    cost is one pass over the embedding column, nothing shuffles);
  *  - random-hyperplane LSH buckets for corpus-scale search — candidates
  *    only meet inside a bucket, so the join is keyed (never all-pairs).
  *
  * Vector math uses `zip_with` + `aggregate` (left-fold in document order),
  * which keeps the arithmetic codegen'd, deterministic, and reproducible by
  * the DuckDB oracle.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** B5 baseline — exact top-k cosine neighbors for each query vector.
    * Queries (vec_id < nQueries) are broadcast; rank per query is a window
    * over the query key. Ties broken by vec_id for determinism.
    */
  def bruteTopK(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("query_vec")), 6))
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random hyperplanes: component h of plane p is a
    * zero-mean value derived from xxhash64(p, h). Engine-independent, no RNG.
    */
  private def planeComponent(p: Int, h: Column): Column =
    (pmod(xxhash64(lit(p), h), lit(1000)).cast("double") - lit(499.5)) / lit(499.5)

  /** Sign-bit bucket key from `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** B5 scale path — LSH ANN: bucket the corpus by hyperplane signs, probe
    * each query's bucket (plus multiprobe variants one bit away), top-k
    * within candidates. The corpus↔query meet is an equi-join on bucket
    * keys: at 100 TB the corpus bucketing is one narrow pass and the join
    * shuffles only bucket-key groups.
    */
  def lshTopK(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 5,
              nPlanes: Int = 8, multiprobe: Boolean = true): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val corpus = emb.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val qBase = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
        lshBucket(col("embedding"), nPlanes).as("qbucket"))
    // Multiprobe: also search every bucket at Hamming distance 1.
    val probes =
      if (!multiprobe) qBase.withColumn("bucket", col("qbucket"))
      else qBase.withColumn("flip",
          explode(array((-1 until nPlanes).map(lit): _*)))
        .withColumn("bucket",
          when(col("flip") === -1, col("qbucket"))
            .otherwise(col("qbucket").bitwiseXOR(expr("shiftleft(cast(1 as bigint), flip)"))))
        .drop("flip")
    val scored = corpus.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("embedding"), col("query_vec")), 6))
    val byQuery = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id"), col("cos")).distinct()
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("cos"))
      .orderBy("query_id", "rank")
  }
}
