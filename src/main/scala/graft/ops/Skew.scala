package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY.md §4: "skewed keys → salting or AQE
  * skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; salting is the
  * explicit tool for the pathological hot key (one user/session/null-bucket
  * holding a double-digit share of a 100 TB fact table), where even a split
  * partition pins a single join key to a single task.
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, saltBuckets); the small/replicable side is exploded ×saltBuckets so
    * every (key, salt) pair finds its match. The hot key's rows now spread
    * over `saltBuckets` tasks. Semantics are exactly `big JOIN small USING
    * (key)` for inner joins.
    *
    * The salt is derived from a stable row fingerprint (xxhash64 over the
    * big side's columns), not rand(), so the operator stays deterministic
    * and retry-safe (a recomputed task re-derives identical salts).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(saltBuckets)).cast("int"))
    val smallExploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew diagnosis: per-key row share of the top keys — the check that
    * decides between plain shuffle, AQE, and salting.
    */
  def keySkew(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    // ONE scan of the raw input: the per-key counts persist and the
    // denominator is a scalar aggregate over that (much smaller) keyed
    // table — df.count() was a second full pass of the fact table just for
    // the total. Eager scalar fetch is fine in a diagnostic tool, and the
    // whole result is materialized eagerly too (bounded: topN rows) so the
    // persisted counts can be RELEASED here instead of squatting in the
    // block manager until someone clears caches — this is a diagnostic
    // run occasionally inside long-lived sessions, the exact caller that
    // least expects a cache residue.
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("rows")).persist()
    try {
      val totalRow = counts.agg(sum(col("rows"))).first()
      val total = if (totalRow.isNullAt(0)) 1.0 else totalRow.getLong(0).toDouble
      val out = counts
        .withColumn("share", round(col("rows") / total, 4))
        .orderBy(col("rows").desc)
        .limit(topN)
      val rows = java.util.Arrays.asList(out.collect(): _*)
      df.sparkSession.createDataFrame(rows, out.schema)
    } finally { counts.unpersist(); () }
  }
}
