package graft

import graft.config._
import graft.streaming._

import java.net.{HttpURLConnection, URL}
import java.nio.file.{Files, Paths}
import scala.io.Source

/** Daemon surface: listener-fed metrics + health/metrics HTTP endpoints
  * (mrcond/src/main.rs:53-73) driven by real streaming queries.
  */
class DaemonSpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(stream).mkString
    conn.disconnect()
    (code, body)
  }

  test("listener feeds lifecycle gauges; /health and /metrics serve over HTTP") {
    val base = tempDir("daemon")
    val metrics = new MetricsRegistry
    val listener = new GraftQueryListener(metrics)
    spark.streams.addListener(listener)
    try {
      // config with one collection, events staged in its source subdir
      val src = s"$base/source/testcoll"
      Files.createDirectories(Paths.get(src))
      Files.write(Paths.get(src, "events.json"),
        """{"event_id":7,"ts_us":1704067200000000,"user_id":3,"event_type":"view","value":2.5,"props":"{}"}"""
          .getBytes)
      val settings = Settings.create(
        Connections(s"$base/source", s"$base/queues"),
        Seq(CollectionConfig(WatchedDb("test", "testcoll"),
          ResumeTokensDb("test", "tokens"), QueueSink("stream_testcoll")))).toOption.get

      val supervisor = new Supervisor(spark, settings, metrics,
        GraftDaemon.startQuery(settings.connections), lifecycleMetrics = false)
      // bind port 0 so a concurrent JVM on the host can't collide
      val http = GraftDaemon.serveHttp(0, metrics, supervisor)
      val port = http.getAddress.getPort
      try {
        supervisor.startAll()
        val (hc, hb) = get(s"http://localhost:$port/health")
        assert(hc === 200 && hb === "OK")
        supervisor.awaitAll(60000)
        // listener events are async; wait for the started counter
        val deadline = System.currentTimeMillis() + 30000
        while (metrics.value(MetricsRegistry.TasksStarted) < 1 &&
               System.currentTimeMillis() < deadline) Thread.sleep(100)
        assert(metrics.value(MetricsRegistry.TasksStarted) === 1)
        assert(metrics.value(MetricsRegistry.CollectionServers,
          "collection" -> "testcoll", "database" -> "test") >= 0)
        val (mc, mb) = get(s"http://localhost:$port/metrics")
        assert(mc === 200)
        assert(mb.contains("mrcon_tasks_started_total"))
        assert(mb.contains("mrcon_running_servers_total"))
        // delivered to the queue
        assert(spark.read.parquet(s"$base/queues/stream_testcoll")
          .where(org.apache.spark.sql.functions.col("event_id") === 7).count() === 1)
      } finally {
        http.stop(0)
        supervisor.stopAll() // the continuous-trigger stream must not outlive the test
      }
    } finally spark.streams.removeListener(listener)
  }

  test("graceful shutdown stops the control plane first, then quiesces every stream") {
    val base = tempDir("daemon-shutdown")
    val src = s"$base/source/shutcoll"
    Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(src, "events.json"),
      """{"event_id":1,"ts_us":1704067200000000,"user_id":1,"event_type":"view","value":1.5,"props":"{}"}"""
        .getBytes)
    val metrics = new MetricsRegistry
    val settings = Settings.create(
      Connections(s"$base/source", s"$base/queues"),
      Seq(CollectionConfig(WatchedDb("test", "shutcoll"),
        ResumeTokensDb("test", "tokens"), QueueSink("stream_shutcoll")))).toOption.get
    // the daemon's own continuous trigger: the stream stays live until stopped
    val supervisor = new Supervisor(spark, settings, metrics,
      GraftDaemon.startQuery(settings.connections), lifecycleMetrics = false)
    val http = GraftDaemon.serveHttp(0, metrics, supervisor)
    val port = http.getAddress.getPort
    supervisor.startAll()
    assert(supervisor.healthy(), "stream should be live before shutdown")

    GraftDaemon.shutdown(http, supervisor)

    assert(supervisor.activeQueries.isEmpty, "streams must be stopped")
    assert(!supervisor.healthy(), "no live stream may remain after shutdown")
    intercept[java.io.IOException] { get(s"http://localhost:$port/health") }
    // idempotent: a second call (hook + finally both fire) must not throw
    GraftDaemon.shutdown(http, supervisor)
  }
}
