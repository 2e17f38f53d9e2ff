package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * All operators read through here so scale-sensitive read settings live in
  * one place. `events.parquet` carries nanosecond timestamps, which Spark's
  * parquet reader rejects by default; sessions that read it must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` AT SESSION BUILD (every
  * entry-point builder in this repo does — Verify/Bench/QueryBench/
  * PlanAudit/GraftDaemon/the test session). It is deliberately NOT set here:
  * flipping session conf inside a reader would silently change other readers
  * on a shared session. The raw longs convert to microsecond timestamps with
  * integer division (never via double — a 19-digit nano epoch loses
  * precision in a double mantissa).
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Events with `ts` normalized to a microsecond TimestampType column.
    * DuckDB equivalent of the conversion: `CAST(ts AS TIMESTAMP)` (both
    * truncate nanos toward negative infinity for the epochs in our data).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}
