package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding storage operators (SURVEY.md §2 B18): per-vector max-abs int8
  * quantization — the standard 4× storage/bandwidth reduction applied before
  * a 100 TB embedding corpus is written or served. Pure per-row projection:
  * zero shuffle, runs at parquet scan speed on any cluster size.
  */
object Embeddings {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Quantize a double-array column to int8 with a per-vector max-abs scale.
    * Rounding is `floor(x * 127 / maxabs + 0.5)` — explicit half-up, chosen
    * over `round` because engines disagree on half-even vs half-away ties;
    * this exact formula is replayed by the DuckDB oracle. Zero vectors
    * quantize to zeros (scale 0).
    *
    * Equivalence witness for the codegen'd QuantizeVector (FunctionsSpec
    * pins expr ≡ this formulation). NOT for hot paths: `maxabs` sits inside
    * the quantize lambda, and interpreted HOF lambdas get no common-
    * subexpression elimination, so it re-reduces the vector once PER
    * ELEMENT — O(n²). [[quantize]] hoists it into a projected column.
    */
  def quantizeCols(v: Column): (Column, Column) = {
    val maxabs = array_max(transform(v, x => abs(x)))
    val q = transform(v, x =>
      when(maxabs === 0.0, lit(0L))
        .otherwise(floor(x * lit(127.0) / maxabs + lit(0.5)).cast("long")))
    (maxabs / lit(127.0), q)
  }

  /** Library form: embeddings with an int8 (tinyint) payload + scale, the
    * columns a production write would persist. Dequantization is
    * `q * scale`. The max-abs reduce is projected BEFORE the quantize
    * lambda references it, so it runs once per vector, not once per
    * element (see [[quantizeCols]]).
    */
  def quantize(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val vd = "__graft_vd"
    val ma = "__graft_maxabs"
    df.withColumn(vd, asDouble(col(vecCol)))
      .withColumn(ma, array_max(transform(col(vd), x => abs(x))))
      .withColumn("scale", col(ma) / lit(127.0))
      .withColumn("q", transform(col(vd), x =>
        when(col(ma) === 0.0, lit(0L))
          .otherwise(floor(x * lit(127.0) / col(ma) + lit(0.5)).cast("long"))
          .cast("byte")))
      .drop(vd, ma)
  }

  /** B18 (registered, oracle-portable) — quantization summary per vector:
    * the scale factor, the l2 norm, and the quantized vector serialized as a
    * csv string (arrays hash engine-differently in the parity gate; the
    * string form is canonical). One codegen'd QuantizeVector pass per row —
    * the HOF formulation in [[quantizeCols]] evaluates four interpreted
    * lambda passes per vector — with identical arithmetic order, so the
    * oracle hash is unchanged. Registered as `embedding_quantize`.
    */
  def quantizeSummary(spark: SparkSession, dir: String): DataFrame = {
    val qz = graft.functions.VectorExpressions.quantizeVector(col("embedding"))
    Tables.embeddings(spark, dir)
      .withColumn("qz", qz)
      .select(
        col("vec_id"),
        col("label"),
        round(col("qz.maxabs") / lit(127.0), 6).as("scale"),
        round(sqrt(col("qz.ss")), 6).as("l2_norm"),
        col("qz.q_csv").as("q_csv"))
      .orderBy("vec_id")
  }
}
