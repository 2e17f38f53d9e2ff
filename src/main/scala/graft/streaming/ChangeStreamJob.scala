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

  /** The change-event envelope + JSON payload, shared by every stream. */
  def toChangeEvents(events: DataFrame, db: String, coll: String): DataFrame =
    events.select(
      col("event_id"),
      format_string("%016x", col("event_id")).as("resume_token"),
      when(col("event_type").isin("signup", "purchase"), "insert")
        .when(col("event_type").isin("click", "view"), "update")
        .otherwise("delete").as("operation_type"),
      lit(db).as("ns_db"), lit(coll).as("ns_coll"),
      col("user_id").as("document_key"),
      to_json(struct(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))).as("full_document"),
      timestamp_micros(col("ts_us")).as("cluster_time")
    )

  /** Start one connector stream: watch `sourceDir` (json files), publish
    * change-event JSON to `queueDir`, checkpoint in `checkpointDir`.
    * Restarting with the same checkpointDir resumes after the last committed
    * batch — the A2 semantics.
    */
  def start(spark: SparkSession, sourceDir: String, queueDir: String,
            checkpointDir: String, db: String = "test", coll: String = "testcoll",
            queryName: String = "connector"): StreamingQuery = {
    val events = spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 4)
      .json(sourceDir)
    toChangeEvents(events, db, coll)
      .writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Publish: one parquet file set per epoch == per-batch confirm.
        batch.withColumn("epoch", lit(batchId))
          .write.mode("append").parquet(queueDir)
        ()
      }
      .start()
  }
}
