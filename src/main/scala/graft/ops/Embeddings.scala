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

  /** B38 — per-label prototype (mean) embeddings, the supervised
    * embedding-space diagnostic a labeled corpus runs before training:
    * class prototypes feed nearest-prototype QA ([[prototypeAssign]]),
    * outlier screens, and per-class drift monitoring. Emitted in exploded
    * long form (label, pos, m, n_vecs) — one scalar row per component —
    * because array columns hash engine-differently in the parity gate
    * (same canonicalization choice as quantizeSummary's q_csv).
    *
    * Scale shape: posexplode is a narrow pass; the groupBy keys on
    * (label, component) — labels×dim rows total, partial-aggregated
    * map-side, so a billion-vector class shuffles one row per mapper per
    * component. `pos` is 1-based to mirror the oracle's generate_series.
    */
  def labelPrototypes(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(asDouble(col("embedding"))).as(Seq("pos0", "x")))
      .groupBy(col("label"), (col("pos0") + 1).as("pos"))
      .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("n_vecs"))
      .orderBy("label", "pos")

  /** B38b — nearest-prototype assignment + confusion counts: every vector
    * assigned to its max-cosine class prototype (ties → higher label,
    * mirroring NearestCentroid's higher-index rule), aggregated to the
    * (label, assigned) confusion matrix — the cluster-purity answer to
    * "do the embeddings separate the classes?".
    *
    * The prototype matrix is labels×dim (KBs regardless of corpus size —
    * same driver-bounded-collect contract as the IVF centroids) and rides
    * the codegen'd NearestCentroid expression; component means round to 6
    * decimals exactly as ivfCentroids' means do, so the DuckDB oracle
    * rebuilds bit-identical prototypes in SQL. The corpus pass is one
    * narrow assignment + a labels²-key partial-aggregated groupBy.
    */
  def prototypeAssign(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // driver-side prototype build FROM labelPrototypes — the one aggregation
    // both diagnostics share, so assignment can never drift from the
    // published prototype table (its round-6 means are already the ones the
    // oracle rebuilds). Labels sorted ascending = matrix index order, so
    // NearestCentroid's higher-index tie rule is higher-label.
    val protoRows = labelPrototypes(spark, dir)
      .select(col("label"), col("pos"), col("m"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val labels = protoRows.map(_._1).distinct.sorted
    val protos: Array[Array[Double]] = labels.map { lb =>
      protoRows.filter(_._1 == lb).sortBy(_._2).map(_._3)
    }.toArray
    val labelOf = typedlit(labels.toSeq)
    emb.select(col("label"),
        graft.functions.VectorExpressions.nearestCentroid(col("embedding"), protos).as("idx"))
      .select(col("label"), element_at(labelOf, col("idx") + 1).as("assigned"))
      .groupBy("label", "assigned").agg(count(lit(1)).as("n"))
      .orderBy("label", "assigned")
  }
}
