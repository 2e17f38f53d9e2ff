package graft

import graft.streaming.{ChangeStreamJob, KafkaEventSource}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract test for the production Kafka binding of the EventSource seam.
  * No broker exists in the sandbox, so the pure wire-schema mapping is
  * driven on STATIC frames shaped exactly like Kafka's source output —
  * the decode path a live `format("kafka")` stream would run row-for-row.
  */
class KafkaSourceSpec extends SparkSpec {

  /** A static frame with Kafka's fixed wire schema. */
  private def wire(values: Seq[String]) = {
    val s = spark
    import s.implicits._
    values.zipWithIndex.map { case (v, i) =>
      (s"k$i".getBytes("UTF-8"), v.getBytes("UTF-8"), "events", 0, i.toLong,
        new java.sql.Timestamp(1704067200000L + i), 0)
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
  }

  private def eventJson(id: Long): String =
    s"""{"event_id": $id, "ts_us": ${1704067200000000L + id}, "user_id": ${id % 7},
       | "event_type": "click", "value": ${id}.5, "props": "{\\"k\\": $id}"}"""
      .stripMargin.replace("\n", "")

  test("decode maps Kafka wire rows to the event envelope, schema exact") {
    val got = KafkaEventSource.decode(wire(Seq(eventJson(1), eventJson(2))))
    assert(got.schema === ChangeStreamJob.eventSchema)
    val rows = got.orderBy("event_id").collect()
    assert(rows.map(_.getAs[Long]("event_id")).toSeq === Seq(1L, 2L))
    assert(rows.head.getAs[Long]("ts_us") === 1704067200000001L)
    assert(rows.head.getAs[String]("event_type") === "click")
    assert(rows.head.getAs[Double]("value") === 1.5)
  }

  test("decode drops malformed values instead of poisoning the stream") {
    val got = KafkaEventSource.decode(wire(Seq(
      eventJson(10), "not json at all", """{"some": "other schema"}""")))
    assert(got.collect().map(_.getAs[Long]("event_id")).toSeq === Seq(10L))
  }

  test("decoded rows feed the change-event envelope like any other source") {
    val events = KafkaEventSource.decode(wire(Seq(eventJson(3))))
    val env = ChangeStreamJob.toChangeEvents(events, "appdb", "events").collect()
    assert(env.length === 1)
    assert(env.head.getAs[String]("resume_token") === f"${3L}%016x")
    assert(env.head.getAs[String]("ns_db") === "appdb")
  }

  test("load fails fast without the kafka package (sandbox has none)") {
    val e = intercept[IllegalArgumentException] {
      KafkaEventSource("broker:9092", "events").load(spark)
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
  }

  test("sink encode: key = document key, value round-trips the envelope") {
    import graft.streaming.KafkaQueuePublisher
    // ids 3 and 12: document_key = user_id = id % 7 → keys "3" and "5"
    val events = KafkaEventSource.decode(wire(Seq(eventJson(3), eventJson(12))))
    val envelope = ChangeStreamJob.toChangeEvents(events, "appdb", "events")
    val rec = KafkaQueuePublisher.encode(envelope)
    assert(rec.columns.toSeq === Seq("key", "value"))
    val rows = rec.collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("3", "5"))
    // the value is the envelope as JSON — a consumer reparses it losslessly
    val parsed = rec.select(from_json(col("value"), envelope.schema).as("e")).select("e.*")
    assert(parsed.orderBy("event_id").collect().map(_.getAs[Long]("event_id")).toSeq ===
      Seq(3L, 12L))
    assert(parsed.where(col("operation_type").isNull).count() === 0)
  }

  test("kafka publisher fails fast without the kafka package") {
    import graft.streaming.KafkaQueuePublisher
    val events = KafkaEventSource.decode(wire(Seq(eventJson(1))))
    val envelope = ChangeStreamJob.toChangeEvents(events, "appdb", "events")
    val e = intercept[IllegalArgumentException] {
      KafkaQueuePublisher("broker:9092", "events").publish(envelope, 0L)
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
  }
}
