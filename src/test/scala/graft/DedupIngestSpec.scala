package graft

import graft.streaming.DedupIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming incremental dedup (SURVEY.md §2 B20): content seen in ANY
  * earlier micro-batch must never be emitted again, the index must
  * accumulate across restarts, and epoch replay must be idempotent.
  */
class DedupIngestSpec extends SparkSpec {

  private def writeBatch(dir: String, name: String, docs: Seq[(Long, String)]): Unit = {
    val lines = docs.map { case (id, text) =>
      s"""{"doc_id":$id,"text":"$text","lang":"en","source":"s"}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name.json"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("cross-batch dedup: history suppresses repeats; index accumulates over restarts") {
    val src = tempDir("ingest-src")
    val out = tempDir("ingest-out")
    val idx = tempDir("ingest-idx") + "/index" // not yet existing
    val cp = tempDir("ingest-cp")

    // batch 1: two distinct texts, one in-batch dup
    writeBatch(src, "b1", Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon", 3L -> "alpha beta gamma"))
    val q1 = DedupIngest.start(spark, src, out, idx, cp, trigger = Trigger.AvailableNow())
    q1.awaitTermination()
    val out1 = spark.read.parquet(out)
    assert(out1.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L),
      "in-batch dup must keep only the first doc_id")

    // batch 2 after a restart: one historical dup, one new text
    writeBatch(src, "b2", Seq(4L -> "delta epsilon", 5L -> "zeta eta theta"))
    val q2 = DedupIngest.start(spark, src, out, idx, cp, trigger = Trigger.AvailableNow())
    q2.awaitTermination()
    val all = spark.read.parquet(out)
    assert(all.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 5L),
      "text already in the index must be dropped after restart")
    assert(spark.read.parquet(idx).select("text_hash").distinct().count() === 3)

    // re-running with no new input must change nothing (epoch idempotence)
    val q3 = DedupIngest.start(spark, src, out, idx, cp, trigger = Trigger.AvailableNow())
    q3.awaitTermination()
    assert(spark.read.parquet(out).count() === 3)
    assert(spark.read.parquet(idx).count() === 3)
  }

  test("randomized cross-batch feed keeps exactly the first occurrence of every text") {
    val src = tempDir("ingest-rnd-src")
    val out = tempDir("ingest-rnd-out")
    val idx = tempDir("ingest-rnd-idx") + "/index"
    val cp = tempDir("ingest-rnd-cp")
    // 60 docs drawing from 25 distinct texts (heavy dup rate), ids assigned
    // in arrival order and split across 3 drained runs — the kept set must
    // be exactly min(doc_id) per distinct text, however the dups straddle
    // micro-batch and restart boundaries.
    val rng = new scala.util.Random(13)
    val pool = (0 until 25).map(i => s"text $i ${"pad " * (i % 4)}".trim)
    val docs = (1L to 60L).map(id => id -> pool(rng.nextInt(pool.size)))
    val expected = docs.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    docs.grouped(20).zipWithIndex.foreach { case (batch, i) =>
      writeBatch(src, s"rb$i", batch)
      val q = DedupIngest.start(spark, src, out, idx, cp, trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    val kept = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expected,
      s"extra: ${kept -- expected}; missing: ${expected -- kept}")
    assert(spark.read.parquet(idx).select("text_hash").distinct().count() ===
      docs.map(_._2).distinct.size.toLong)
  }

  test("withinWatermarkDedup: horizon suppression, then engine-expired state re-admits") {
    import org.apache.spark.sql.functions._
    val src = tempDir("wmdedup-src")
    val out = tempDir("wmdedup-out") + "/data"
    val cp = tempDir("wmdedup-cp")
    def writeTimed(name: String, docs: Seq[(Long, String, Long)]): Unit = {
      val lines = docs.map { case (id, text, sec) =>
        s"""{"doc_id":$id,"text":"$text","sec":$sec}"""
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$src/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def runBatch(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, sec LONG")
        .json(src)
        .withColumn("ts", timestamp_seconds(col("sec")))
      val q = DedupIngest.withinWatermarkDedup(stream, "ts", "10 seconds")
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .outputMode("append")
        .format("parquet")
        .option("path", out)
        .start()
      q.awaitTermination()
    }
    // batch 1: in-horizon duplicate suppressed (t=10 and t=11, delay 10s);
    // the two NULL-text docs (missing field) both pass through — null
    // content routes around the dedup instead of folding into one state key
    writeTimed("w1", Seq((1L, "alpha", 10L), (2L, "alpha", 11L)))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$src/w1n.json"),
      """{"doc_id": 90, "sec": 10}
        |{"doc_id": 91, "sec": 11}""".stripMargin)
    runBatch()
    // batch 2: watermark still behind the key's expiry → suppressed; the
    // t=100 row also advances the watermark to 90s for the next batch
    writeTimed("w2", Seq((3L, "alpha", 100L)))
    runBatch()
    // batch 3: watermark (90s) passed expiry (first-seen 10s + 10s) → the
    // engine dropped the state and the same content is re-admitted
    writeTimed("w3", Seq((4L, "alpha", 110L)))
    runBatch()
    val kept = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L),
      s"in-horizon duplicate must be suppressed: $kept")
    assert(kept.contains(4L),
      s"post-horizon duplicate must be re-admitted (bounded state): $kept")
    assert(kept.contains(90L) && kept.contains(91L),
      s"distinct null-text docs must BOTH survive (no content to dedup on): $kept")
  }

  test("dedupBatch against an explicit index is a pure keyed anti-join") {
    val s = spark
    import s.implicits._
    val batch = Seq((10L, "seen before"), (11L, "brand new"), (12L, "brand new"))
      .toDF("doc_id", "text")
    val index = Seq(java.security.MessageDigest.getInstance("MD5")
      .digest("seen before".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .toDF("text_hash")
    val fresh = DedupIngest.dedupBatch(batch, index)
    assert(fresh.select("doc_id").collect().map(_.getLong(0)).toSet === Set(11L))
  }
}
