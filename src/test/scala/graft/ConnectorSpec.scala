package graft

import graft.config._
import graft.streaming.Connector
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** The D5 library facade end-to-end, mirroring the reference's e2e flow
  * (mrcond/tests/e2e.rs): from_collection → connect → events in the queue,
  * resuming from the facade-named token location on reconnect.
  */
class ConnectorSpec extends SparkSpec {

  private def writeEvents(dir: String, name: String, ids: Range): Unit = {
    val rows = ids.map { i =>
      s"""{"event_id":$i,"ts_us":${1704067200000000L + i * 1000000L},"user_id":${i % 7},""" +
        s""""event_type":"view","value":1.5,"props":"{}"}"""
    }
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes)
  }

  test("fromCollection → connect delivers the collection's events to its queue") {
    val base = tempDir("connector")
    val connections = Connections(s"$base/source", s"$base/queues")
    val cfg = CollectionConfig(WatchedDb("test", "conncoll"),
      ResumeTokensDb("test", "tokens"), QueueSink("stream_conncoll"))
    writeEvents(s"$base/source/conncoll", "first.json", 0 until 25)

    val connector = Connector.fromCollection(spark, connections, cfg)
    val q = connector.connect("stream_conncoll")
    q.awaitTermination(60000)

    val out = spark.read.parquet(s"$base/queues/stream_conncoll")
    assert(out.count() === 25)
    assert(out.where(col("ns_db") === "test" && col("ns_coll") === "conncoll").count() === 25)
    // the facade's token location IS the live checkpoint (A3 semantics)
    val tokens = connector.resumeTokensLocation("stream_conncoll")
    assert(Files.exists(Paths.get(tokens, "offsets")), s"no checkpoint at $tokens")
  }

  test("reconnect resumes after the last committed event — no redelivery") {
    val base = tempDir("connector")
    val connections = Connections(s"$base/source", s"$base/queues")
    val cfg = CollectionConfig(WatchedDb("test", "conncoll"),
      ResumeTokensDb("test", "tokens"), QueueSink("stream_conncoll"))
    val connector = Connector.withSession(spark, connections, cfg)

    writeEvents(s"$base/source/conncoll", "first.json", 0 until 10)
    connector.connect("s1").awaitTermination(60000)
    writeEvents(s"$base/source/conncoll", "second.json", 10 until 15)
    connector.connect("s1").awaitTermination(60000)

    val ids = spark.read.parquet(s"$base/queues/stream_conncoll")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids === (0L until 15L).toArray, s"redelivery or loss: ${ids.mkString(",")}")
  }
}
