package graft

import graft.ops.{Dedup, Joins}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends SparkSpec {

  test("asofJoin picks the latest build row at-or-before each probe row, null before any") {
    val s = spark
    import s.implicits._
    val probe = Seq(
      (1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 20L, "p20"),
      (2L, 7L, "q7")
    ).toDF("k", "t", "ptag")
    val build = Seq(
      (1L, 10L, "b10"), (1L, 15L, "b15"),
      (2L, 9L, "b9")
    ).toDF("k", "t", "btag")
    val got = Joins.asofJoin(probe, build, "k", "t", Seq("btag"))
      .select("k", "t", "ptag", "btag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3)))).toSet
    assert(got === Set(
      (1L, 5L, "p5", None),        // before any build row
      (1L, 10L, "p10", Some("b10")), // equal time is inclusive
      (1L, 20L, "p20", Some("b15")), // latest earlier, not first
      (2L, 7L, "q7", None)          // other key's build rows invisible
    ))
  }

  test("asofJoin carry is atomic: a null field in the latest build row stays null") {
    val s = spark
    import s.implicits._
    val probe = Seq((1L, 3L, "p")).toDF("k", "t", "ptag")
    // latest build row (t=2) legitimately carries a null v — per-column
    // last(ignoreNulls) would tear it, pairing t=2's id with t=1's v
    val build = Seq(
      (1L, 1L, Some(10L), Some(5.0)),
      (1L, 2L, Some(11L), None)
    ).toDF("k", "t", "bid", "v")
    val row = Joins.asofJoin(probe, build, "k", "t", Seq("bid", "v")).collect().head
    assert(row.getAs[Long]("bid") === 11L)
    assert(row.isNullAt(row.fieldIndex("v")),
      "the carried row is the LATEST build row verbatim — its null field must stay null")
  }

  test("asofJoin plan contains NO join node — one exchange, window carry-forward") {
    val df = Joins.clickPurchaseAsof(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    // REPARTITION_BY_NUM exchanges are the read layer spreading a
    // single-row-group scan (Tables.spread), not operator cost.
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && !l.contains("REPARTITION_BY_NUM"))
    assert(exchanges <= 2, // purchase-dedup groupBy + the asof key partition
      s"as-of should cost at most two hash exchanges, found $exchanges:\n$plan")
  }

  test("rangeJoin keeps exactly the in-interval pairs, each once, across bucket boundaries") {
    val s = spark
    import s.implicits._
    // bucketSecs = 10; interval spans buckets 0..2, probes sit on the
    // boundaries and just outside
    val probe = Seq((1L, 0L), (1L, 5L), (1L, 10L), (1L, 25L), (1L, 26L), (2L, 5L))
      .toDF("k", "t")
    val ivs = Seq((1L, 5L, 25L)).toDF("k", "lo", "hi")
    val got = Joins.rangeJoin(probe, ivs, "k", "t", "lo", "hi", 10L)
      .select("k", "t").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === Seq((1L, 5L), (1L, 10L), (1L, 25L)),
      s"inclusive bounds, no duplicates, no cross-key: ${got.toSeq}")
  }

  test("range_join plan is an equi-join on (key, bucket) — no nested loop, no cartesian") {
    val df = Joins.prePurchaseViews(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
    assert(df.count() > 0, "sf0.001 must produce at least one attributed view")
  }

  test("asofJoin: NULL keys never match (SQL equality), carries stay null") {
    val s = spark
    import s.implicits._
    // a NULL-key build row must NOT be carried onto a NULL-key probe row —
    // the ON k = k join this operator replaces never matches NULL = NULL
    val probe = Seq((java.lang.Long.valueOf(1L), 10L), (null.asInstanceOf[java.lang.Long], 10L))
      .toDF("k", "t")
    val build = Seq((java.lang.Long.valueOf(1L), 5L, "a"), (null.asInstanceOf[java.lang.Long], 5L, "b"))
      .toDF("k", "t", "v")
    val got = Joins.asofJoin(probe, build, "k", "t", Seq("v")).collect()
    val keyed = got.find(r => !r.isNullAt(0)).get
    assert(keyed.getAs[String]("v") === "a", "non-null key still matches")
    val nullKey = got.find(_.isNullAt(0)).get
    assert(nullKey.isNullAt(nullKey.fieldIndex("v")),
      "NULL-key probe must not receive a NULL-key build row's carry")
  }

  test("rangeJoin: a NULL-bounded interval matches nothing instead of killing the job") {
    val s = spark
    import s.implicits._
    val probe = Seq((1L, 50L), (2L, 50L)).toDF("k", "t")
    val intervals = Seq(
      (1L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),   // matches
      (2L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(100L)) // open start: BETWEEN semantics -> no match
    ).toDF("k", "start_s", "end_s")
    val got = Joins.rangeJoin(probe, intervals, "k", "t", "start_s", "end_s", 60L)
      .select("k").as[Long].collect().toSeq
    assert(got === Seq(1L), s"only the bounded interval may match, got $got")
  }

  test("passage dedup keeps first occurrence corpus-wide and reassembles in order") {
    val s = spark
    import s.implicits._
    val w = 4
    def words(tag: String) = (1 to w).map(i => s"$tag$i").mkString(" ")
    val shared = words("dup")
    val dir = tempDir("passages")
    Seq(
      (1L, s"$shared ${words("a")}"),   // owns the shared passage (min doc_id)
      (2L, s"${words("b")} $shared"),   // loses only its copy of the shared passage
      (3L, shared)                      // fully duplicated: nothing kept
    ).map { case (id, text) => (id, text, "en", "src", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.passageDedup(spark, dir, window = w).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"), r.getAs[String]("kept_text")))).toMap
    assert(got(1L) === ((2L, 2L, s"$shared ${words("a")}")))
    assert(got(2L) === ((2L, 1L, words("b"))))
    assert(got(3L) === ((1L, 0L, "")))
  }
}
