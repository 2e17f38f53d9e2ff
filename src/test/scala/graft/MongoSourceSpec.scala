package graft

import graft.streaming.{ChangeStreamJob, MongoEventSource}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract test for the native MongoDB change-stream binding of the
  * EventSource seam. No mongod exists in the sandbox, so the pure
  * wire-schema mappings are driven on STATIC frames shaped exactly like the
  * connector's change-stream output (publish.full.document.only=false) —
  * the decode path a live `format("mongodb")` stream would run row-for-row.
  * Mirrors KafkaSourceSpec; reference semantics:
  * mrcon/src/mongo/connector.rs:127-167.
  */
class MongoSourceSpec extends SparkSpec {

  /** A static frame with the connector's change-stream wire schema. */
  private def wire(rows: Seq[(String, String, Long, String, String)]) = {
    val data = rows.map { case (token, op, clusterSec, docKey, fullDoc) =>
      Row(Row(token), op, s"""{"$$timestamp": {"t": $clusterSec, "i": 1}}""",
        Row("appdb", "events"), docKey, fullDoc)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data), MongoEventSource.wireSchema)
  }

  private def eventJson(id: Long): String =
    s"""{"event_id": $id, "ts_us": ${1704067200000000L + id}, "user_id": ${id % 7},
       | "event_type": "click", "value": ${id}.5, "props": "{\\"k\\": $id}"}"""
      .stripMargin.replace("\n", "")

  private def insertRow(id: Long): (String, String, Long, String, String) =
    (f"82$id%014x", "insert", 1704067200L + id, s"""{"_id": ${id % 7}}""", eventJson(id))

  test("decode maps change-stream wire rows to the event feed, schema exact") {
    val got = MongoEventSource.decode(wire(Seq(insertRow(1), insertRow(2))))
    assert(got.schema === ChangeStreamJob.eventSchema)
    val rows = got.orderBy("event_id").collect()
    assert(rows.map(_.getAs[Long]("event_id")).toSeq === Seq(1L, 2L))
    assert(rows.head.getAs[Long]("ts_us") === 1704067200000001L)
    assert(rows.head.getAs[String]("event_type") === "click")
    assert(rows.head.getAs[Double]("value") === 1.5)
  }

  test("decode drops deletes (no fullDocument) and malformed documents") {
    val del = ("82aa000000000000", "delete", 1704067300L, """{"_id": 3}""", null: String)
    val bad = ("82bb000000000000", "insert", 1704067301L, """{"_id": 4}""", "not json")
    val got = MongoEventSource.decode(wire(Seq(insertRow(10), del, bad)))
    assert(got.collect().map(_.getAs[Long]("event_id")).toSeq === Seq(10L))
  }

  test("decodeEnvelope matches the engine envelope schema and keeps deletes") {
    val del = ("82aa000000000000", "delete", 1704067300L, """{"_id": 3}""", null: String)
    val env = MongoEventSource.decodeEnvelope(wire(Seq(insertRow(5), del)))
    // Schema-identical to what every other source produces via toChangeEvents
    val viaEvents = ChangeStreamJob.toChangeEvents(
      MongoEventSource.decode(wire(Seq(insertRow(5)))), "appdb", "events")
    assert(env.schema.map(f => (f.name, f.dataType)) ===
      viaEvents.schema.map(f => (f.name, f.dataType)))
    val rows = env.orderBy(col("event_id").asc_nulls_last).collect()
    assert(rows.length === 2)
    val ins = rows.head
    assert(ins.getAs[Long]("event_id") === 5L)
    assert(ins.getAs[String]("resume_token") === f"82${5L}%014x")
    assert(ins.getAs[String]("operation_type") === "insert")
    assert(ins.getAs[String]("ns_db") === "appdb")
    assert(ins.getAs[Long]("document_key") === 5L)
    assert(ins.getAs[java.sql.Timestamp]("cluster_time").getTime === 1704067205000L)
    // the delete survives with its NATIVE operationType and null document —
    // fidelity the re-derived event-feed path cannot provide
    val d = rows(1)
    assert(d.getAs[String]("operation_type") === "delete")
    assert(d.getAs[Long]("document_key") === 3L)
    assert(d.getAs[String]("full_document") === null)
    assert(d.isNullAt(d.fieldIndex("event_id")))
  }

  test("envelope rows feed the queue publisher payload like any source") {
    import graft.streaming.KafkaQueuePublisher
    val env = MongoEventSource.decodeEnvelope(wire(Seq(insertRow(3))))
    val rec = KafkaQueuePublisher.encode(env).collect()
    assert(rec.length === 1)
    // value round-trips: the consumer reparses the envelope it was sent
    val parsed = KafkaQueuePublisher.encode(env)
      .select(from_json(col("value"), env.schema).as("e")).select("e.*").collect()
    assert(parsed.head.getAs[String]("resume_token") === f"82${3L}%014x")
  }

  test("load fails fast without the mongo connector (sandbox has none)") {
    val e = intercept[IllegalArgumentException] {
      MongoEventSource("mongodb://host:27017", "appdb", "events").load(spark)
    }
    assert(e.getMessage.contains("mongo-spark-connector"))
  }
}
