package graft

import org.apache.spark.sql.functions._

/** Pins the events reader's timestamp-encoding dispatch (Tables.events).
  *
  * The driver's generated `events.parquet` has shipped `ts` under two
  * physical encodings across rounds — nanosecond INT64 (reads as LongType
  * under `nanosAsLong`) and parquet TIMESTAMP(MICROS, adjustedToUTC=false)
  * (reads as TIMESTAMP_NTZ) — and the round-9 flip from the former to the
  * latter broke every events query at the scan until the reader learned to
  * dispatch on the scanned type. This spec writes the SAME logical rows
  * under both encodings and asserts Tables.events normalizes them to one
  * identical TimestampType column, so a future encoding change (back, or
  * to a third form) fails here with a readable diff instead of as an
  * analysis error inside twenty query plans.
  */
class TablesSpec extends SparkSpec {

  private def eventRows = Seq(
    (1L, 1704067200000000L, 10L, "view", 1.0, "{}"),     // 2024-01-01T00:00:00Z
    (2L, 1704067200123456L, 10L, "click", 2.0, "{}"),    // sub-second micros
    (3L, 1704153599999999L, 11L, "purchase", 3.0, "{}")) // end-of-day edge

  test("events normalizes nano-long and micro-timestamp encodings identically") {
    val s = spark
    import s.implicits._
    val nanoDir = tempDir("graft_ev_nano")
    val microDir = tempDir("graft_ev_micro")
    val df = eventRows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // old-style: ns INT64 (plain long column, like the pre-r9 testdata and
    // the fixtures other specs write)
    df.withColumn("ts", col("ts") * 1000L)
      .write.mode("overwrite").parquet(s"$nanoDir/events.parquet")
    // new-style: TIMESTAMP_NTZ column -> parquet TIMESTAMP(MICROS,
    // adjustedToUTC=false), the round-9 driver layout
    df.withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$microDir/events.parquet")

    val fromNano = Tables.events(spark, nanoDir)
    val fromMicro = Tables.events(spark, microDir)
    assert(fromNano.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(fromNano.schema === fromMicro.schema,
      "both encodings must normalize to one schema")

    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(fromNano) === eventRows.map(e => (e._1, e._2)),
      "nano longs must divide to exact micros")
    assert(rows(fromNano) === rows(fromMicro),
      "the same logical instants must survive either encoding")
  }

  test("an already-zoned timestamp column passes through unchanged") {
    val s = spark
    import s.implicits._
    val dir = tempDir("graft_ev_tz")
    Seq((1L, 1704067200000000L, 10L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    assert(got.select(unix_micros(col("ts"))).head().getLong(0) === 1704067200000000L)
  }
}
