package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators (SURVEY.md §2 C10/C11): as-of join and
  * interval (range) join — the two joins time-series/event engines ship
  * natively and vanilla SQL engines express as slow theta-joins. Both are
  * built here as Spark-first compositions whose cost at 100 TB is one
  * hash exchange, never a per-key cross product.
  */
object Joins {

  /** C10 — as-of join: each probe row picks the LATEST build row with
    * `build.time <= probe.time` for the same key (the canonical
    * trade-vs-quote / event-vs-state lookup).
    *
    * Spark-first shape: NOT a join at all. Both sides union (build rows
    * tagged 0, probe rows 1), one window partitioned by key and ordered by
    * (time, side) carries every build column forward with
    * last(ignoreNulls), and probe rows are filtered back out with their
    * carried values. ONE shuffle on the key — the same exchange a groupBy
    * would pay — no range predicate, no pair explosion; a naive
    * `t1.ts <= t2.ts` theta-join is quadratic per key and shows up as
    * BroadcastNestedLoopJoin (JoinsSpec pins the absence of any join node).
    * Build rows sort BEFORE probe rows at equal time, so "as of" is
    * inclusive, matching ASOF JOIN `probe.ts >= build.ts` semantics.
    *
    * Contract: `carry` columns must not exist on the probe side, and build
    * must be unique per (key, time) — equal-time build rows have no defined
    * "latest"; dedupe upstream with max_by (see [[clickPurchaseAsof]]).
    * Probe rows with no earlier build row keep null carries (left join
    * semantics).
    *
    * The carry is ONE struct, not per-column last() calls: independent
    * last(ignoreNulls) per column would tear rows — a legitimately-null
    * value in the latest build row falls back to an OLDER row's value for
    * that column only, pairing fields from build rows that never coexisted.
    * The struct is never null for a build row, so last(ignoreNulls) picks
    * the latest build ROW atomically and null fields stay null.
    *
    * NULL keys never match (SQL equality semantics, like the `ON k = k`
    * join this replaces): Window.partitionBy groups all NULL keys into one
    * partition, so without the guard a NULL-key probe row would silently
    * receive a NULL-key build row's carry — the final projection nulls the
    * carry for NULL-key probes instead.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String, time: String,
               carry: Seq[String]): DataFrame = {
    require(carry.nonEmpty, "as-of join needs at least one carried build column")
    require(!carry.exists(probe.columns.contains),
      s"carried build columns ${carry.mkString(",")} must not collide with probe columns")
    val tagged = probe.withColumn("__side", lit(1))
      .unionByName(
        build.select(col(key), col(time), struct(carry.map(col): _*).as("__carry"))
          .withColumn("__side", lit(0)),
        allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(probe.columns.map(col) ++
        carry.map(c => when(col(key).isNotNull, col(s"__carry.$c")).as(c)): _*)
  }

  /** C11 — interval (range) join: probe rows (key, t) against intervals
    * (key, start, end), keeping pairs with `start <= t <= end` (inclusive
    * both ends, BETWEEN semantics).
    *
    * Spark-first shape: bucketed equi-join. Every interval explodes to the
    * coarse time buckets it covers (span/bucketSecs + 1 rows); every probe
    * row lives in exactly ONE bucket (t div bucketSecs); the meet is an
    * equi-join on (key, bucket) plus the residual BETWEEN filter. Because
    * a probe has one bucket and an interval emits each covered bucket
    * once, a true match meets exactly once — no post-join dedup. At scale
    * both sides shuffle once on (key, bucket): hash-partitionable,
    * AQE-skew-splittable, where the naive theta-join degenerates to a
    * nested-loop cross product per key. Size `bucketSecs` near the median
    * interval span: the explode factor stays ~2 while most bucket-collided
    * candidates survive the residual filter.
    */
  def rangeJoin(probe: DataFrame, intervals: DataFrame, key: String, t: String,
                start: String, end: String, bucketSecs: Long,
                maxBuckets: Int = 4096): DataFrame = {
    require(bucketSecs > 0, "bucketSecs must be positive")
    // Width guard, like every other candidate generator here (guardedPairs,
    // maxBlock, maxDf): one corrupt or open-ended interval — a far-future
    // sentinel end, or end < start — would make sequence() materialize
    // millions of bucket rows (or overflow outright). Fail loudly instead
    // of silently exploding; legitimate wide intervals mean bucketSecs is
    // mis-sized for the data, which is a modeling bug worth surfacing.
    // A NULL start or end is BETWEEN semantics' "matches nothing": explode
    // of a NULL array drops the interval row, exactly like the theta-join
    // this replaces (NULL BETWEEN never matches) — without the explicit
    // branch the NULL comparison fell through to the ELSE and raise_error
    // killed the whole job for one open-ended interval.
    val b = s"${bucketSecs}L"
    val ivb = intervals.withColumn("__bucket", explode(expr(
      s"""CASE WHEN $start IS NULL OR $end IS NULL THEN CAST(NULL AS ARRAY<BIGINT>)
         |WHEN $end >= $start AND ($end div $b - $start div $b) <= $maxBuckets
         |THEN sequence($start div $b, $end div $b)
         |ELSE raise_error('rangeJoin: interval spans more than $maxBuckets buckets or end < start; fix the interval table or raise bucketSecs')
         |END""".stripMargin)))
    val pb = probe.withColumn("__bucket", expr(s"$t div ${bucketSecs}L"))
    pb.join(ivb, Seq(key, "__bucket"))
      .where(col(t).between(col(start), col(end)))
      .drop("__bucket")
  }

  /** Registered `asof_join`: for every click, the user's most recent
    * purchase at or before the click (purchases deduped to one row per
    * (user, ts) — the max event_id wins, making "latest" well defined).
    * wait_secs is how long the click trailed that purchase; clicks before
    * any purchase carry nulls.
    */
  def clickPurchaseAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("purch_id"),
        max_by(col("value"), col("event_id")).as("purch_value"))
      .withColumn("purch_s", col("ts").cast("long"))
    asofJoin(clicks, purchases, "user_id", "ts",
        Seq("purch_id", "purch_value", "purch_s"))
      .select(col("event_id"), col("user_id"), col("click_value"),
        col("purch_id"), col("purch_value"),
        (col("ts").cast("long") - col("purch_s")).as("wait_secs"))
      .orderBy("event_id")
  }

  /** Registered `range_join`: views inside the 24h attribution window
    * ending at each user's FIRST purchase — interval side is one row per
    * purchasing user, probe side is every view event. Inner join: views
    * outside every window drop.
    */
  def prePurchaseViews(spark: SparkSession, dir: String): DataFrame = {
    val daySecs = 86400L
    val ev = Tables.events(spark, dir)
    val intervals = ev.where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min("event_id").as("fp_event"),
        min_by(col("ts").cast("long"), col("event_id")).as("fp_s"))
      .select(col("user_id"), col("fp_event"),
        (col("fp_s") - daySecs).as("start_s"), col("fp_s").as("end_s"))
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("view_s"), col("value").as("view_value"))
    rangeJoin(views, intervals, "user_id", "view_s", "start_s", "end_s", daySecs)
      .select(col("user_id"), col("fp_event"),
        col("event_id").as("view_event"), col("view_value"),
        (col("end_s") - col("view_s")).as("secs_before_purchase"))
      .orderBy("user_id", "view_event")
  }
}
