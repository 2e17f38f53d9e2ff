package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D23 — declarative data-quality contracts (Deequ-style, dependency-free):
  * a table "contract" is a list of named checks; ALL scalar checks compute
  * in ONE aggregation pass over the table (each check contributes a partial
  * aggregate — count / conditional-violation count / min — so the scan cost
  * is one table read regardless of how many checks ride it, exactly how
  * Deequ batches its analyzers), then pivot to one (check, metric, pass)
  * row each. Referential checks (FK orphans) are the one shape that needs a
  * second relation: a left-anti hash join, counted — never a NOT IN nested
  * loop.
  *
  * This is the ingest gate a 100 TB pipeline runs BEFORE curation: a
  * schema-valid parquet drop can still carry null payloads, duplicated ids,
  * or broken FKs, and catching that costs one scan here vs a corrupted
  * training corpus downstream.
  */
object Contracts {

  /** One scalar check: `metric` is an aggregate expression over the table,
    * `pass` the verdict derived from the final metric value.
    */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Run scalar checks in ONE aggregation pass and pivot to one row per
    * check: (check, metric DOUBLE round-6, pass BOOLEAN), ordered by name.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "a contract needs at least one check")
    val agg = df.agg(checks.head.metric.as(checks.head.name),
      checks.tail.map(c => c.metric.as(c.name)): _*)
    val rows = checks.map { c =>
      struct(lit(c.name).as("check"),
        round(col(c.name).cast("double"), 6).as("metric"),
        c.pass(col(c.name)).as("pass"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check"), col("r.metric"), col("r.pass"))
      .orderBy("check")
  }

  /** The documents-table contract (registered as `dq_checks`): cardinality,
    * id uniqueness, payload presence, derived-column consistency, dimension
    * presence — plus the orders→customer referential check as the FK row.
    * Ratio metrics are integer-ratio doubles (engine-exact), violation
    * counts are plain longs.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = count(lit(1)).cast("double")
    val docChecks = run(docs, Seq(
      Check("doc_row_count", n, _ >= 1.0),
      Check("doc_id_unique_ratio", count_distinct(col("doc_id")).cast("double") / n, _ === 1.0),
      Check("doc_text_null_count",
        sum(when(col("text").isNull, 1L).otherwise(0L)), _ === 0.0),
      Check("doc_nchars_mismatch_count",
        sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)), _ === 0.0),
      Check("doc_lang_missing_count",
        sum(when(col("lang").isNull || col("lang") === "", 1L).otherwise(0L)), _ === 0.0),
      Check("doc_min_chars", min(col("n_chars")), _ > 0.0)))
    // FK: every order's customer exists — left-anti hash join, counted
    val orphans = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).cast("double").as("m"))
      .select(lit("orders_custkey_orphans").as("check"),
        round(col("m"), 6).as("metric"), (col("m") === 0.0).as("pass"))
    docChecks.unionByName(orphans).orderBy("check")
  }
}
