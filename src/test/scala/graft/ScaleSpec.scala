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

  test("90%-one-key fact-fact join: AQE skew split and salting both hold per-task reads within 2x mean") {
    val s = spark
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> scala.util.Try(Option(s.conf.get(k))).toOption.flatten)
    try {
      // the suite session runs 4 shuffle partitions; the skew observable
      // needs a realistic fan-out for max/mean to mean anything
      s.conf.set("spark.sql.shuffle.partitions", "32")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // production defaults split 256 MB granules; act at suite scale
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val nKeys = 100000L
      // 32 map partitions on the skewed side: AQE splits a skewed reduce
      // partition at MAP-BLOCK granularity, so the suite session's default
      // parallelism (4) would cap the hot key at a 4-way split
      def a = s.range(0L, 2000000L, 1L, 32).select(
        when(col("id") % 10 < 9, lit(0L))
          .otherwise(pmod(hash(col("id")), lit(nKeys)).cast("long") + 1L).as("key"),
        col("id").as("pa"))
      def b = s.range(0L, 200000L, 1L, 32).select(
        (col("id") % (nKeys + 1L)).as("key"), col("id").as("pb"))
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)), sum(col("pa")), sum(col("pb"))).collect().head

      var unsplitRow: org.apache.spark.sql.Row = null
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val unsplit = Skew.stageLoadOf(s) { unsplitRow = agg(a.join(b, "key")) }
      assert(unsplit.imbalance > 5.0,
        s"the baseline must exhibit real skew (one task reads the hot 90%): $unsplit")

      var aqeRow: org.apache.spark.sql.Row = null
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val aqe = Skew.stageLoadOf(s) { aqeRow = agg(a.join(b, "key")) }
      assert(aqe.imbalance <= 2.0, s"AQE skew split must spread the hot key: $aqe")

      var saltRow: org.apache.spark.sql.Row = null
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val salted = Skew.stageLoadOf(s) { saltRow = agg(Skew.saltedJoin(a, b, "key", 32)) }
      assert(salted.imbalance <= 2.0, s"salting must spread the hot key: $salted")

      // all three strategies compute the identical join
      assert(unsplitRow === aqeRow && aqeRow === saltRow,
        s"strategies disagree: $unsplitRow / $aqeRow / $saltRow")
    } finally saved.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
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

  test("two-level rank ops keep per-task input near the mean on a 90%-one-source corpus") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
    // The design claim behind tokenBudgetMix/sourceCapSample (VERDICT r6
    // asked for it as a MEASURED number): on an adversarially skewed corpus
    // the shard decomposition means no window task ever holds a whole
    // class. Synthesize 50k docs, 90% from one domain (and 90% one lang),
    // run both operators, and read the actual per-task shuffle rows off
    // the listener. A single-level window would put all ~45k hot-class
    // rows in ONE task; two-level must keep every task within 2x the mean.
    val dir = tempDir("skew_docs")
    val n = 50000
    spark.range(1, n + 1).select(
        col("id").as("doc_id"),
        when(col("id") % 10 =!= 0, "en").otherwise(concat(lit("l"), col("id") % 7)).as("lang"),
        when(col("id") % 10 =!= 0, "hotdomain.com")
          .otherwise(concat(lit("cold"), col("id") % 37, lit(".com"))).as("source"),
        lit("alpha beta gamma delta").as("text"))
      .write.parquet(s"$dir/documents.parquet")
    val taskReads = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    // The listener is session-global and sbt runs suites in parallel, so a
    // concurrent suite's corpus-sized shuffle could land in taskReads and
    // flake the 2x-mean assert. Scope the capture to THIS test's jobs: tag
    // them with a job group, map group -> stage ids at job start, and only
    // record tasks from those stages.
    val jobGroup = "scale-skew-measure"
    val ownStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        if (e.properties != null &&
            jobGroup == e.properties.getProperty("spark.jobGroup.id"))
          e.stageInfos.foreach(si => ownStages.add(si.stageId))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null && ownStages.contains(e.stageId))
          taskReads.add((e.stageId, m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // AQE's small-partition coalescing would fold this toy shuffle into one
    // task and blind the measurement; at 100 TB the same partitions sit far
    // above the advisory size and never coalesce, so disabling it here is
    // what makes the toy measurement representative of the at-scale layout.
    val prevCoalesce = spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      spark.sparkContext.setJobGroup(jobGroup, "skew measurement actions")
      try {
        graft.ops.Curation.sourceCapSample(spark, dir, cap = 1000, shardBits = 8).count()
        graft.ops.Curation.tokenBudgetMix(spark, dir, perLangTokens = Long.MaxValue,
          shardBits = 8).count()
      } finally spark.sparkContext.clearJobGroup()
      // The listener bus posts asynchronously; a fixed sleep can under-read
      // on a stalled host (documented multi-second stalls) and silently
      // drop the one hot task the assertion exists to catch. Drain
      // deterministically instead: poll until the event count is stable
      // across consecutive checks.
      var stable = 0
      var last = -1
      val drainDeadline = System.currentTimeMillis() + 30000
      while (stable < 4 && System.currentTimeMillis() < drainDeadline) {
        Thread.sleep(250)
        val n = taskReads.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      val byStage = taskReads.toArray(Array.empty[(Int, Long)]).groupBy(_._1)
        .map { case (stage, rs) => (stage, rs.map(_._2)) }
      // The stages that matter: the window shuffles carrying the full
      // corpus (>= n rows). Group-count/broadcast stages are KB-scale.
      val wide = byStage.filter(_._2.sum >= n)
      assert(wide.nonEmpty, s"expected at least one corpus-wide shuffle stage, saw ${byStage.map { case (s, r) => s -> r.sum }}")
      wide.foreach { case (stage, reads) =>
        val mean = reads.sum.toDouble / reads.length
        val hot = reads.max.toDouble
        assert(hot <= 2.0 * mean,
          s"stage $stage: max task read ${reads.max} rows vs mean $mean — " +
            s"a task is holding a skewed class (single-level would hold ~${n * 9 / 10})")
      }
    } finally {
      prevCoalesce match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
      }
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("GraftExtensions exposes the operator surface to SQL: scalar family + table-valued entry points") {
    // exercise the extension's registration shape...
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // ...and the SQL surface through the SAME companion builders on the live
    // session (getOrCreate reuses the shared test session, so
    // extensions-by-config can't be exercised in-JVM; the registry path and
    // the builders are identical — one definition, two wiring paths)
    GraftExtensions.scalarFunctions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    GraftExtensions.tableFunctions.foreach { case (name, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    // cosine_sim: exact, orthogonal, and dimension-mismatch-to-null
    val r = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val r3 = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D, 3.0D), array(1.0D, 0.0D)) AS c").collect().head
    assert(r3.isNullAt(0), "dimension mismatch is an error signal (null), never a truncated score")
    // token_counts ≡ the composed-builtin formulation
    val tc = spark.sql("SELECT token_counts('ab cd  ef-gh').ws_tokens AS w, " +
      "token_counts('ab cd  ef-gh').bpeish_tokens AS b").collect().head
    assert(tc.getLong(0) === 4L && tc.getLong(1) === 5L)
    // term_frequencies: literal term list, exact counts + dl
    val tf = spark.sql("SELECT term_frequencies('a b a c', array('a', 'c')) AS t").collect().head
    assert(tf.getStruct(0).getLong(0) === 4L)
    assert(tf.getStruct(0).getSeq[Long](1) === Seq(2L, 1L))
    // shingle_hashes: same md5 family the Scala API uses
    val sh = spark.sql("SELECT size(shingle_hashes('a b c d', 3).h24) AS n").collect().head
    assert(sh.getInt(0) === 2, "two 3-shingles of a 4-token doc")
    // deflated_size: repetition compresses below the raw length
    val ds = spark.sql("SELECT deflated_size(repeat('ab', 200), 6) AS z").collect().head
    assert(ds.getLong(0) < 100L)
    // a non-literal parameter is a clear resolution error, not a misplan
    val bad = intercept[Exception] {
      spark.sql("SELECT deflated_size('x', ws_tokens) FROM " +
        "(SELECT token_counts('a').ws_tokens AS ws_tokens)").collect()
    }
    assert(bad.getMessage.contains("literal"))
    // table-valued entry points: the flagship ops from pure SQL, plan-equal
    // to the Scala API
    val sqlDedup = spark.sql(s"SELECT * FROM graft_dedup_survivors('$sf0001') ORDER BY doc_id")
    val apiDedup = graft.ops.Dedup.exact(spark, sf0001).orderBy("doc_id")
    assert(sqlDedup.collect() === apiDedup.collect(),
      "SQL TVF must answer exactly like the Scala API")
    val sqlBm25 = spark.sql(
      s"SELECT * FROM graft_bm25('$sf0001', array('spark', 'window', 'merge'))")
    val apiBm25 = graft.ops.Relevance.bm25Search(spark, sf0001)
    assert(sqlBm25.collect() === apiBm25.collect())
    // r17: the retrieval family — hybrid RRF and exact phrase — from SQL,
    // row-for-row equal to the Scala plans they return
    val sqlHybrid = spark.sql(
      s"SELECT * FROM graft_hybrid_search('$sf0001', 0, array('spark', 'window', 'merge'))")
    val apiHybrid = graft.ops.Relevance.hybridSearch(spark, sf0001,
      queries = Seq(0L -> Seq("spark", "window", "merge")))
    assert(sqlHybrid.collect() === apiHybrid.collect())
    // derive a phrase that provably occurs: the first doc's first 3 tokens
    val firstText = graft.Tables.documents(spark, sf0001)
      .orderBy("doc_id").select("text").head().getString(0)
    val phrase = firstText.split(" ").take(3).mkString(" ")
    val sqlPhrase = spark.sql(
      s"SELECT * FROM graft_phrase_search('$sf0001', '$phrase')")
    val apiPhrase = graft.ops.Relevance.phraseOccurrences(
      graft.Tables.documents(spark, sf0001), phrase)
    assert(sqlPhrase.collect() === apiPhrase.collect())
    assert(sqlPhrase.count() > 0, "the derived phrase must actually occur")
    val sqlGopher = spark.sql(s"SELECT * FROM graft_gopher_rules('$sf0001')")
    val apiGopher = graft.ops.Curation.gopherRules(spark, sf0001)
    assert(sqlGopher.collect() === apiGopher.collect())
    // a non-string term array is the intended clear error, not a cast blowup
    val badTerms = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_bm25('$sf0001', array(1, 2))").collect()
    }
    assert(badTerms.getMessage.contains("string-array literal"),
      s"got: ${badTerms.getMessage}")
  }
}
