package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Stateful streaming sessionization (flatMapGroupsWithState). */
class SessionizeSpec extends SparkSpec {

  test("streaming sessions close on gap and survive checkpointed state") {
    val (src, out, ckpt) = (tempDir("sess_src"), tempDir("sess_out") + "/s", tempDir("sess_ckpt"))
    val t0 = 1704067200000000L
    def line(id: Long, user: Long, tsUs: Long, v: Double) =
      s"""{"event_id":$id,"ts_us":$tsUs,"user_id":$user,"event_type":"click","value":$v,"props":"{}"}"""
    // user 1: two sessions split by a >30min gap; user 2: one session
    val gap = Sessionize.GapSeconds * 1000000L
    Files.write(Paths.get(src, "a.json"), Seq(
      line(1, 1, t0, 1.0), line(2, 1, t0 + 60L * 1000000, 2.0),
      line(3, 1, t0 + gap + 120L * 1000000, 4.0),
      line(10, 2, t0, 8.0), line(11, 2, t0 + 5L * 1000000, 16.0)
    ).mkString("\n").getBytes)

    val q = Sessionize.start(spark, src, out, ckpt)
    q.awaitTermination(120000)
    // the gap-closed session for user 1 must be emitted
    val closed = spark.read.parquet(out).collect()
    val u1 = closed.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length === 1)
    assert(u1.head.getAs[Long]("first_event") === 1L)
    assert(u1.head.getAs[Long]("last_event") === 2L)
    assert(u1.head.getAs[Long]("n_events") === 2L)
    assert(u1.head.getAs[Double]("sum_value") === 3.0)
    assert(u1.head.getAs[String]("closed_by") === "gap")

    // restart from checkpoint with one more event inside user 2's session
    // window: state must still be open (no user-2 session emitted yet)
    assert(closed.count(_.getAs[Long]("user_id") == 2L) === 0)
    Files.write(Paths.get(src, "b.json"),
      line(12, 2, t0 + 10L * 1000000, 32.0).getBytes)
    val q2 = Sessionize.start(spark, src, out, ckpt)
    q2.awaitTermination(120000)
    // still open (no gap yet) — but state carried 3 events; force the close
    // with a far-future event
    Files.write(Paths.get(src, "c.json"),
      line(13, 2, t0 + 3 * gap, 64.0).getBytes)
    val q3 = Sessionize.start(spark, src, out, ckpt)
    q3.awaitTermination(120000)
    val u2 = spark.read.parquet(out).filter(r => r.getAs[Long]("user_id") == 2L)
      .collect()
    assert(u2.length === 1, "exactly one closed session for user 2")
    assert(u2.head.getAs[Long]("n_events") === 3L, "state survived the restart")
    assert(u2.head.getAs[Double]("sum_value") === 56.0)
  }

  test("continuous mode: an idle user's open session closes by timeout and frees state") {
    val (src, out, ckpt) = (tempDir("ct_src"), tempDir("ct_out") + "/s", tempDir("ct_ckpt"))
    val t0 = 1704067200000000L
    Files.write(Paths.get(src, "a.json"),
      s"""{"event_id":1,"ts_us":$t0,"user_id":5,"event_type":"click","value":2.0,"props":"{}"}"""
        .getBytes)
    // short idle timeout via a custom query (mirrors Sessionize.start
    // continuous mode but with a test-sized timeout)
    val s = spark
    import s.implicits._
    val q = s.readStream.schema(graft.streaming.ChangeStreamJob.eventSchema).json(src)
      .as[Sessionize.Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout)(
        Sessionize.updateSession(Sessionize.GapSeconds * 1000000L, idleTimeout = Some("2 seconds")))
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .option("checkpointLocation", ckpt)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Sessionize.SessionOut], _: Long) =>
        batch.write.mode("append").parquet(out)
        ()
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 90000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        done = try spark.read.parquet(out).count() > 0 catch { case _: Throwable => false }
      }
      assert(done, "timed-out session was never emitted")
      val row = spark.read.parquet(out).collect().head
      assert(row.getAs[Long]("user_id") === 5L)
      assert(row.getAs[String]("closed_by") === "timeout")
      assert(row.getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("streaming drain mode agrees with batch sessionization on a randomized feed") {
    // The batch windows and the stateful stream are INDEPENDENT
    // implementations of the same gap semantics — a seeded random feed with
    // mid-session micro-batch boundaries must produce identical sessions.
    val (src, out, ckpt) = (tempDir("agree_src"), tempDir("agree_out") + "/s", tempDir("agree_ckpt"))
    val pq = tempDir("agree_pq")
    val rng = new scala.util.Random(11)
    val t0 = 1704067200L // whole seconds: gap math identical in s and us
    val gapS = Sessionize.GapSeconds
    // per-user event times: mostly small deltas, occasional > gap splits
    val raw = (1L to 25L).flatMap { user =>
      var t = t0 + rng.nextInt(600)
      (0 until (3 + rng.nextInt(12))).map { _ =>
        t += (if (rng.nextInt(5) == 0) gapS + 60 + rng.nextInt(3600) else 1 + rng.nextInt(120))
        (user, t, rng.nextInt(100) * 0.25) // dyadic values: double sum exact
      }
    }
    // ids in global time order so event_id order == time order per user
    val events = raw.sortBy { case (u, t, _) => (t, u) }.zipWithIndex
      .map { case ((u, t, v), i) => (i + 1L, u, t, v) }
    def line(e: (Long, Long, Long, Double)) =
      s"""{"event_id":${e._1},"ts_us":${e._3 * 1000000L},"user_id":${e._2},"event_type":"click","value":${e._4},"props":"{}"}"""
    val (half1, half2) = events.splitAt(events.length / 2)
    val tFar = events.map(_._3).max + 10 * gapS
    val flush = events.map(_._2).distinct.sorted.zipWithIndex
      .map { case (u, i) => (1000000L + i, u, tFar, 0.0) }
    // three drained runs: mid-session boundaries + a flush that closes all
    Files.write(Paths.get(src, "a.json"), half1.map(line).mkString("\n").getBytes)
    Sessionize.start(spark, src, out, ckpt).awaitTermination(120000)
    Files.write(Paths.get(src, "b.json"), half2.map(line).mkString("\n").getBytes)
    Sessionize.start(spark, src, out, ckpt).awaitTermination(120000)
    Files.write(Paths.get(src, "c.json"), flush.map(line).mkString("\n").getBytes)
    Sessionize.start(spark, src, out, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_event"),
        r.getAs[Long]("last_event"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSet

    // batch reference over the same (non-flush) events, via the parquet
    // reader's ns-timestamp path
    val s = spark
    import s.implicits._
    events.map { case (id, u, t, v) => (id, t * 1000000000L, u, "click", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$pq/events.parquet")
    val batch = Sessionize.sessions(spark, pq).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("first_event"),
        r.getAs[Long]("last_event"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toSet
    assert(streamed === batch,
      s"stream-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
    assert(batch.size > 25, "the random feed must actually split sessions")
  }

  test("late out-of-order events merge without regressing the session horizon") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val t0 = 1704067200000000L
    val sec = 1000000L
    val gapUs = Sessionize.GapSeconds * sec
    def ev(id: Long, tsUs: Long) =
      Sessionize.Event(id, tsUs, 7L, "click", 1.0, "{}")
    val st = TestGroupState.create[Sessionize.SessionState](
      org.apache.spark.api.java.Optional.empty[Sessionize.SessionState](), GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    // batch 1: one on-time event at t0+5000s
    assert(Sessionize.updateSession(gapUs)(7L,
      Iterator(ev(5, t0 + 5000 * sec)), st).isEmpty)
    // batch 2: a LATE event (older ts, newer id) — must merge, and must NOT
    // pull the session horizon back to t0+100s (the old bug: the next
    // on-time event then read as a 4900s gap and spuriously closed)
    assert(Sessionize.updateSession(gapUs)(7L,
      Iterator(ev(6, t0 + 100 * sec)), st).isEmpty)
    assert(st.get.lastTsUs === t0 + 5000 * sec, "horizon must be monotone")
    // batch 3: on-time event 100s after the true horizon — same session
    assert(Sessionize.updateSession(gapUs)(7L,
      Iterator(ev(7, t0 + 5100 * sec)), st).isEmpty,
      "no spurious close after a late merge")
    assert(st.get.nEvents === 3L)
    assert(st.get.firstEvent === 5L && st.get.lastEvent === 7L)
  }

  test("gap boundary uses the batch path's whole-second truncation") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val t0 = 1704067200000000L
    def ev(id: Long, tsUs: Long) = Sessionize.Event(id, tsUs, 9L, "click", 1.0, "{}")
    val gapUs = Sessionize.GapSeconds * 1000000L
    val st = TestGroupState.create[Sessionize.SessionState](
      org.apache.spark.api.java.Optional.empty[Sessionize.SessionState](), GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    // 10.4s -> 1810.9s: micro diff 1800.5s would split; the batch/oracle
    // path truncates to 1810-10=1800 <= gap and keeps one session — the
    // streaming path must agree on the same boundary event
    assert(Sessionize.updateSession(gapUs)(9L,
      Iterator(ev(1, t0 + 10400000L), ev(2, t0 + 1810900000L)), st).isEmpty,
      "truncated-second gap semantics must match the batch path")
    assert(st.get.nEvents === 2L)
  }

  test("session conversion matches a local replay over the registered session split") {
    val got = Sessionize.sessionConversion(spark, sf0001).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converted"), r.getAs[Double]("conversion"))).toMap
    // local replay: same gap rule, same whole-second truncation
    val ev = Tables.events(spark, sf0001)
      .selectExpr("event_id", "user_id", "cast(ts as long) as s", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val sessions = ev.groupBy(_._2).values.flatMap { rows =>
      val sorted = rows.sortBy(_._1)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(Long, Long, Long, String)]]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev == Long.MinValue || e._3 - prev > 1800L)
          bounds += scala.collection.mutable.ArrayBuffer(e)
        else bounds.last += e
        prev = e._3
      }
      bounds.map(b => (b.map(_._3).min, b.exists(_._4 == "purchase")))
    }.toSeq
    val want = sessions.groupBy { case (start, _) => Math.floorDiv(start, 86400L) }
      .map { case (day, ss) =>
        val conv = ss.count(_._2).toLong
        day -> (ss.size.toLong, conv,
          BigDecimal(conv.toDouble / ss.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    assert(got === want)
    assert(got.values.exists(v => v._3 > 0.0 && v._3 < 1.0),
      "conversion must be a real rate at this SF, not all-0/all-1")
  }

  test("batch sessionization matches a hand-computed session split") {
    val out = Sessionize.sessions(spark, sf0001)
    // sessions partition the events: total n_events == total events
    val total = out.agg(sum("n_events")).collect().head.getLong(0)
    assert(total === Tables.events(spark, sf0001).count())
    // no session spans a gap larger than the threshold internally is
    // guaranteed by construction; spot-check monotone session bounds
    val bad = out.where(col("first_event") > col("last_event")).count()
    assert(bad === 0)
  }
}
