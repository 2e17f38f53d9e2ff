package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming analog of the reference's connector pipeline
  * (mrcon/src/mongo/connector.rs:127-173): watch a feed, publish each change
  * event as JSON to a queue, persist progress so a restart resumes after the
  * last processed event.
  *
  * Spark-first mapping:
  *  - change stream  → file-source `readStream` over an events directory
  *    (new files = new change batches), same envelope as the batch path;
  *  - resume tokens  → the streaming checkpoint (offsets + commits): Spark's
  *    checkpoint IS the resume-token store, giving exactly the
  *    `resume_after(token)` restart semantics (connector.rs:135-142) without
  *    a hand-rolled token table;
  *  - publisher with confirms → `foreachBatch` writing the JSON payloads to
  *    a per-queue "queue" directory; the batch is atomically committed with
  *    the checkpoint, so delivery is at-least-once end-to-end and
  *    exactly-once for an idempotent sink (parquet overwrite per epoch).
  *
  * At scale this runs unchanged: file source → kafka/kinesis source,
  * parquet queue dir → real broker sink inside the same foreachBatch.
  */
object ChangeStreamJob {

  /** Schema of the JSON/parquet event feed the stream watches. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** The change-event envelope + JSON payload — same operationType mapping
    * and full_document shape as the batch path (graft.events.ChangeEvents),
    * so consumers see ONE document format regardless of pipeline.
    */
  def toChangeEvents(events: DataFrame, db: String, coll: String): DataFrame =
    events.select(
      col("event_id"),
      format_string("%016x", col("event_id")).as("resume_token"),
      graft.events.ChangeEvents.operationType(col("event_type")).as("operation_type"),
      lit(db).as("ns_db"), lit(coll).as("ns_coll"),
      col("user_id").as("document_key"),
      graft.events.ChangeEvents.fullDocumentJson(events).as("full_document"),
      timestamp_micros(col("ts_us")).as("cluster_time")
    )

  /** Start one connector stream: watch `sourceDir` (json files), publish
    * change-event JSON to `queueDir`, checkpoint in `checkpointDir`.
    * Restarting with the same checkpointDir resumes after the last committed
    * batch — the A2 semantics.
    */
  def start(spark: SparkSession, sourceDir: String, queueDir: String,
            checkpointDir: String, db: String = "test", coll: String = "testcoll",
            queryName: String = "connector",
            trigger: Trigger = Trigger.AvailableNow(),
            dedupe: Boolean = false): StreamingQuery = {
    val events = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 4)
      .json(sourceDir)
    // Optional source-side exactly-once: an at-least-once feed (redeliveries
    // under the same event_id) is deduped in-stream with watermark-bounded
    // state — the streaming analog of the batch publish_dedup operator.
    val deduped =
      if (!dedupe) events
      else events
        .withColumn("event_time", timestamp_micros(col("ts_us")))
        .withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .drop("event_time")
    toChangeEvents(deduped, db, coll)
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Publish one parquet partition per epoch, OVERWRITTEN on replay:
        // if the stream crashes between the sink commit and the checkpoint
        // commit, the re-run of this batch replaces (not duplicates) its
        // epoch — exactly-once delivery for this idempotent sink.
        batch.withColumn("epoch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch").parquet(queueDir)
        ()
      }
      .start()
  }
}
