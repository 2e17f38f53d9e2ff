package graft

import graft.ops.{Analytics, Dedup, Relevance}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelevanceSpec extends SparkSpec {

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    rows.map { case (id, text) => (id, text, "en", "src", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("sparseCosinePairs: rare shared tokens pair docs; hot tokens are capped out") {
    val dir = tempDir("sparse")
    // "the" appears in all 5 docs (df=5 > maxDf=3 → dropped); docs 1,2
    // share rare tokens r1 r2 r3; doc 3 shares only one rare token with 1.
    writeDocs(dir, Seq(
      (1L, "the r1 r2 r3 only1"),
      (2L, "the r1 r2 r3 only2"),
      (3L, "the r1 single3"),
      (4L, "the lonely4 words4"),
      (5L, "the lonely5 words5")
    ))
    val got = Relevance.sparseCosinePairs(spark, dir, maxDf = 3, minShared = 3,
      shingleN = 1).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("shared")) ===
      ((1L, 2L, 3L)))
    // doc1 keeps {r1, r2, r3} (only1 has df=1 → dropped), doc2 likewise:
    // cosine = 3 / sqrt(3·3) = 1.0 — identical rare-token vectors.
    assert(r.getAs[Double]("cosine") === 1.0)
  }

  test("sparseCosinePairs shingle mode: word order discriminates, short docs drop") {
    val dir = tempDir("sparse3")
    // Docs 1,2 share the 3-shingles "a b c" / "b c d" / "c d e" (shared=3);
    // doc 3 has the SAME words as doc 1 in reverse order — zero shared
    // shingles, which is the point of shingling over a bag of words.
    // Doc 4 is shorter than one shingle and must contribute nothing.
    writeDocs(dir, Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e x"),
      (3L, "e d c b a"),
      (4L, "a b")
    ))
    val got = Relevance.sparseCosinePairs(spark, dir, maxDf = 3, minShared = 3,
      shingleN = 3).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("shared")) ===
      ((1L, 2L, 3L)))
    // doc1 keeps {a b c, b c d, c d e} (df=2 each), doc2 those plus
    // "d e x" (df=1 → dropped): cosine = 3 / sqrt(3·3) = 1.0.
    assert(r.getAs[Double]("cosine") === 1.0)
  }

  test("sparseCosinePairs is non-empty at the driver's gate scale") {
    // r5 verdict: the registered query returned 0 rows at sf0.01, a vacuous
    // oracle match. Registered defaults must yield rows at every test SF.
    assert(Relevance.sparseCosinePairs(spark, sf0001).count() > 0)
  }

  test("sparseCosinePairs plan: no cartesian or nested-loop join") {
    val plan = Relevance.sparseCosinePairs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"inverted index must meet docs only on shared tokens:\n$plan")
  }

  test("bigramCoverage: common transitions score 1, gibberish 0, zero-bigram docs keep a null row") {
    val dir = tempDir("bgcov")
    val sentence = "the cat sat on the mat"
    writeDocs(dir, Seq(
      (1L, sentence), (2L, sentence), (3L, sentence), (4L, sentence), (5L, sentence),
      (6L, "zxq wvu tsr qpo nml"), // every bigram unique in the corpus
      (7L, "solo")                 // one token -> zero bigrams
    ))
    // each sentence bigram occurs exactly 5 times (docs 1-5) = minCount
    val m = Relevance.bigramCoverage(spark, dir, minCount = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m.size === 7, "every doc keeps a row, including the zero-bigram one")
    (1L to 5L).foreach { id =>
      assert(m(id).getAs[Double]("coverage") === 1.0)
      assert(m(id).getAs[Long]("n_bigrams") === 5L)
    }
    assert(m(6L).getAs[Double]("coverage") === 0.0)
    assert(m(6L).getAs[Long]("n_common") === 0L)
    assert(m(7L).getAs[Long]("n_bigrams") === 0L)
    assert(m(7L).isNullAt(m(7L).fieldIndex("coverage")))
  }

  test("bigramCoverage counts occurrences, not distinct bigrams") {
    val dir = tempDir("bgcov2")
    // "a b" occurs 3x in doc 1 and 2x in doc 2 (corpus count 5 >= 5);
    // doc 1's "b z" bridges (2x, rare). Doc 1: 6 bigram occurrences
    // (a b, b z, z a, a b, b z, z a -> wait, recount below) — assert from
    // first principles instead: n_common/n_bigrams computed by hand.
    writeDocs(dir, Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab -> "a b"x3, "b a"x2
      (2L, "a b a b")        // bigrams: ab ba ab       -> "a b"x2, "b a"x1
    ))
    // corpus counts: "a b" = 5 (common at minCount=5), "b a" = 3 (rare)
    val m = Relevance.bigramCoverage(spark, dir, minCount = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_bigrams") === 5L)
    assert(m(1L).getAs[Long]("n_common") === 3L)
    assert(m(1L).getAs[Double]("coverage") === 0.6)
    assert(m(2L).getAs[Long]("n_bigrams") === 3L)
    assert(m(2L).getAs[Long]("n_common") === 2L)
    assert(m(2L).getAs[Double]("coverage") === math.rint(2.0 / 3.0 * 1e6) / 1e6)
  }

  test("lmPerplexity: hand-computed add-k bigram cross-entropy; zero-bigram docs keep a null row") {
    val dir = tempDir("lmppl")
    // bigram counts: (a,b) = 2 (docs 1,2), (a,c) = 1 (doc 3);
    // start counts: c(a·) = 3; vocab = {a, b, c, solo} → V = 4, k = 0.5
    // (doc 4 has no bigrams but its token still counts toward V):
    //   p(b|a) = 2.5 / (3 + 2) = 0.5, p(c|a) = 1.5/5 = 0.3
    // doc 1: ce = ln(2),    ppl = 2.0 exactly
    // doc 3: ce = ln(10/3), ppl = 3.3333
    writeDocs(dir, Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "solo") // one token → zero bigrams, null scores
    ))
    val m = Relevance.lmPerplexity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m.size === 4)
    assert(m(1L).getAs[Long]("n_bigrams") === 1L)
    assert(m(1L).getAs[Double]("cross_entropy") === math.rint(math.log(2.0) * 1e6) / 1e6)
    assert(m(1L).getAs[Double]("perplexity") === 2.0)
    assert(m(3L).getAs[Double]("cross_entropy") === math.rint(math.log(10.0 / 3.0) * 1e6) / 1e6)
    assert(m(3L).getAs[Double]("perplexity") === 3.3333)
    assert(m(4L).getAs[Long]("n_bigrams") === 0L)
    assert(m(4L).isNullAt(m(4L).fieldIndex("cross_entropy")))
    assert(m(4L).isNullAt(m(4L).fieldIndex("perplexity")))
  }

  test("lmPerplexity ranks a never-seen-transitions doc above the corpus norm") {
    val dir = tempDir("lmppl2")
    val sentence = "the cat sat on the mat"
    writeDocs(dir, Seq(
      (1L, sentence), (2L, sentence), (3L, sentence), (4L, sentence),
      (5L, "mat the on sat cat the") // same words, transitions the corpus never repeats
    ))
    val m = Relevance.lmPerplexity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("perplexity")).toMap
    assert(m(5L) > m(1L), s"shuffled doc must score higher perplexity: ${m(5L)} vs ${m(1L)}")
    assert(m(1L) === m(4L), "identical docs score identically")
  }

  test("lmPerplexity is non-empty and fully scored at the driver's gate scale") {
    val rows = Relevance.lmPerplexity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // corpus docs are all multi-token: every row must carry a real score
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("cross_entropy"))))
  }

  test("collocations: adjacent-pair lift, one-token docs contribute nothing") {
    val dir = tempDir("colloc")
    // "new york" always adjacent (5×); "a b" appear but never adjacent
    // enough; one-token doc must not produce a bigram row.
    writeDocs(dir, Seq(
      (1L, "new york new york new york"),
      (2L, "new york new york a"),
      (3L, "b"),
      (4L, "a b a b a b a b")
    ))
    val got = Relevance.collocations(spark, dir, minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("pair_cnt"),
        r.getAs[Double]("lift"))).toList
    // bigram counts: new→york 5×, york→new 3×, a→b 4× (below minCount), b→a 3× (below)
    // N=20 tokens; cnt(new)=5, cnt(york)=5 → lift(new,york) = 5·20/25 = 4.0
    assert(got === List(("new", "york", 5L, 4.0)))
  }

  test("dedupNormalized collapses case/punctuation variants that byte-exact dedup keeps") {
    val dir = tempDir("normdedup")
    writeDocs(dir, Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "goodbye world"),
      (5L, "hello\nworld") // newline variant: separators normalize, not delete
    ))
    val exact = Dedup.exact(spark, dir).count()
    val norm = Dedup.dedupNormalized(spark, dir).collect()
    assert(exact === 5, "byte-exact sees 5 distinct docs")
    assert(norm.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 4L))
    assert(norm.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Long]("n_variants") === 4L)
  }

  test("funnelCounts: stages count only in-order progressions") {
    val s = spark
    import s.implicits._
    val dir = tempDir("funnel")
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // u1: view→click→purchase in order (full funnel)
    // u2: click BEFORE its first view, purchase after nothing → only viewed
    // u3: no view at all → not even stage 1
    Seq(
      (1L, 10L, "view", ts(100)), (2L, 10L, "click", ts(200)), (3L, 10L, "purchase", ts(300)),
      (4L, 20L, "click", ts(100)), (5L, 20L, "view", ts(200)),
      (6L, 30L, "purchase", ts(100))
    ).toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      // store as ns longs like the driver's events.parquet
      .withColumn("ts", expr("cast(ts as long) * 1000000000"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Analytics.funnelCounts(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") === 3L)
    assert(r.getAs[Long]("n_viewed") === 2L)                 // u1, u2
    assert(r.getAs[Long]("n_clicked_after_view") === 1L)     // u1 only
    assert(r.getAs[Long]("n_purchased_after_click") === 1L)  // u1 only
  }

  test("funnelWindowed: a stage completed after the deadline does not count") {
    val s = spark
    import s.implicits._
    val dir = tempDir("funnelw")
    def ts(sec: Long) = sec * 1000000000L
    val T = 259200L // 3 days
    // u1: full funnel inside the deadline at every hop
    // u2: clicks 1s AFTER the 3-day deadline -> stays at viewed
    // u3: clicks in time, purchases after ITS deadline -> stays at clicked
    Seq(
      (1L, 10L, "view", ts(100)), (2L, 10L, "click", ts(100 + T)), (3L, 10L, "purchase", ts(100 + T + 50)),
      (4L, 20L, "view", ts(100)), (5L, 20L, "click", ts(100 + T + 1)),
      (6L, 30L, "view", ts(100)), (7L, 30L, "click", ts(200)), (8L, 30L, "purchase", ts(200 + T + 1))
    ).map { case (e, u, t, tt) => (e, u, t, tt, 1.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Analytics.funnelWindowed(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") === 3L)
    assert(r.getAs[Long]("n_viewed") === 3L)
    assert(r.getAs[Long]("n_clicked_in_window") === 2L)   // u1, u3
    assert(r.getAs[Long]("n_purchased_in_window") === 1L) // u1
    // and the windowed funnel is never larger than the unconstrained one
    val free = Analytics.funnelCounts(spark, dir).collect().head
    assert(r.getAs[Long]("n_clicked_in_window") <= free.getAs[Long]("n_clicked_after_view"))
  }

  test("ltvCohorts: cumulative revenue per cohort matches a local fold") {
    val s = spark
    import s.implicits._
    val dir = tempDir("ltv")
    val wk = 604800L
    // cohort 0: u10 (purchases wk0: 10.0, wk1: 5.0), u20 (no purchases)
    // cohort 1: u30 purchases 2.5 in its week 0
    Seq(
      (1L, 10L, "view", 5L, 0.0), (2L, 10L, "purchase", 10L, 10.0),
      (3L, 10L, "purchase", wk + 10L, 5.0),
      (4L, 20L, "view", 20L, 0.0),
      (5L, 30L, "purchase", wk + 30L, 2.5)
    ).map { case (e, u, t, sec, v) => (e, u, t, sec * 1000000000L, v, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.ltvCohorts(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("weeks_since")) ->
        (r.getAs[Long]("cohort_users"), r.getAs[Double]("revenue"),
          r.getAs[Double]("cum_revenue"), r.getAs[Double]("ltv_per_user"))).toMap
    assert(got === Map(
      (0L, 0L) -> (2L, 10.0, 10.0, 5.0),
      (0L, 1L) -> (2L, 5.0, 15.0, 7.5),
      (1L, 0L) -> (1L, 2.5, 2.5, 2.5)))
  }

  test("sourceDedupRate reconciles exactly with the registered exact dedup") {
    val rates = Dedup.sourceDedupRate(spark, sf0001).collect()
    val totalDropped = rates.map(_.getAs[Long]("n_dropped")).sum
    val totalDocs = rates.map(_.getAs[Long]("n_docs")).sum
    val kept = Dedup.exact(spark, sf0001).count()
    assert(totalDocs - totalDropped === kept,
      "per-source drops must sum to the corpus-wide dedup answer")
    rates.foreach { r =>
      val (n, d, rate) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
        r.getAs[Double]("dup_rate"))
      assert(rate === BigDecimal(d.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // planted: src_a is a copy farm (3 identical of 4), src_b is clean
    val s = spark
    import s.implicits._
    val dir = tempDir("srcdup")
    Seq((1L, "same text body", "src_a"), (2L, "same text body", "src_a"),
      (3L, "same text body", "src_a"), (4L, "unique in a", "src_a"),
      (5L, "clean one", "src_b"), (6L, "clean two", "src_b"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val planted = Dedup.sourceDedupRate(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_dropped"), r.getAs[Double]("dup_rate"))).toMap
    assert(planted === Map("src_a" -> (2L, 0.5), "src_b" -> (0L, 0.0)))
  }

  test("retentionCohorts: offsets measured from each user's first week") {
    val s = spark
    import s.implicits._
    val dir = tempDir("cohort")
    val wk = 604800L
    // u1 first in week 0, returns week 2; u2 first in week 2 only.
    Seq(
      (1L, 10L, wk * 0 + 5), (2L, 10L, wk * 2 + 5),
      (3L, 20L, wk * 2 + 9)
    ).map { case (eid, uid, sec) => (eid, uid, "view", sec * 1000000000L, 1.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.retentionCohorts(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("weeks_since"),
        r.getAs[Long]("n_users"))).toList
    assert(got === List((0L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L)))
  }

  test("distinctUsersApprox stays within the HLL error bound of exact counts") {
    val rsd = 0.02
    val exact = Analytics.distinctUsers(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val approx = Analytics.distinctUsersApprox(spark, sf0001, rsd).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users_approx")).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      // 5x rsd: HLL++'s rsd is a standard deviation, not a hard bound
      assert(err <= 5 * rsd, s"$k: approx=${approx(k)} exact=$n err=$err")
    }
  }

  test("sketchDauRollup: merged weekly sketches bound the exact WAU; repeat-visit gap is non-negative") {
    import org.apache.spark.sql.functions.{col => c, expr => e, countDistinct}
    // DataSketches HLL at lgK 12 has rsd ≈ 1.04/sqrt(2^12) ≈ 1.6%; the 5x
    // safety factor is the distinctUsersApprox precedent (rsd is a std
    // dev, not a hard bound)
    val rsd = 1.04 / math.sqrt(1 << 12)
    val got = Analytics.sketchDauRollup(spark, sf0001).collect()
      .map(r => r.getAs[Long]("week") ->
        (r.getAs[Long]("days_merged"), r.getAs[Long]("wau_est"),
          r.getAs[Long]("sum_daily_dau_est"))).toMap
    assert(got.nonEmpty)
    // same floor-division day/week derivation as the operator
    val exact = Tables.events(spark, sf0001)
      .select(c("user_id"),
        e("((cast(ts as long) - pmod(cast(ts as long), 86400)) div 86400) div 7").as("week"))
      .groupBy("week").agg(countDistinct(c("user_id")).as("wau"))
      .collect().map(r => r.getAs[Long]("week") -> r.getAs[Long]("wau")).toMap
    assert(got.keySet === exact.keySet)
    exact.foreach { case (w, n) =>
      val err = math.abs(got(w)._2 - n).toDouble / n
      assert(err <= 5 * rsd, s"week $w: merged-sketch WAU=${got(w)._2} exact=$n err=$err")
      // summed daily estimates count cross-day repeaters multiple times:
      // the gap the rollup reports must never be (materially) negative
      assert(got(w)._3.toDouble >= got(w)._2 * (1 - 5 * rsd),
        s"week $w: daily-sum ${got(w)._3} below merged ${got(w)._2}")
    }
  }

  test("sourceLmDivergence: a transition-alien source diverges; conforming sources sit near zero") {
    val dir = tempDir("srcdiv")
    val s = spark
    import s.implicits._
    val normal = "the cat sat on the mat and the dog ran to the tree"
    // source B speaks the corpus's transitions; source C has its own —
    // same vocabulary, reversed word order (B60's unigram χ² cannot see it)
    val rows =
      (1L to 8L).map(i => (i, normal, "en", "srcA", normal.length)) ++
      (9L to 12L).map(i => (i, normal, "en", "srcB", normal.length)) ++
      (13L to 16L).map(i =>
        (i, normal.split(" ").reverse.mkString(" "), "en", "srcC", normal.length))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Relevance.sourceLmDivergence(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("divergence"))).toMap
    assert(got.keySet === Set("srcA", "srcB", "srcC"))
    assert(got("srcA")._1 === 8L)
    assert(got("srcC")._2 > got("srcA")._2,
      s"transition-alien source must diverge more: ${got("srcC")} vs ${got("srcA")}")
    assert(got("srcC")._2 > 0.1, s"alien source divergence must be material: ${got("srcC")._2}")
    // srcA dominates the corpus, so the global model ≈ its local model
    assert(math.abs(got("srcA")._2) < got("srcC")._2 / 2)
  }

  test("dailyTrend: RANGE frame shrinks across gap days (not last-7-rows)") {
    val s = spark
    import s.implicits._
    val dir = tempDir("trend")
    // purchases on days 0, 1, and 10: the day-10 window [4, 10] must see
    // ONLY day 10 — a ROWS frame would wrongly pull days 0 and 1 in.
    Seq((1L, 1L, 0L, 10.0), (2L, 2L, 1L, 20.0), (3L, 3L, 10L, 40.0))
      .map { case (eid, uid, day, v) =>
        (eid, uid, "purchase", day * 86400L * 1000000000L, v, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.dailyTrend(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Double]("avg_purchase_7d")).toMap
    assert(got === Map(0L -> 10.0, 1L -> 15.0, 10L -> 40.0))
  }

  test("viewersNoPurchase: anti join stays a hash join, excludes purchasers") {
    val df = Analytics.viewersNoPurchase(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"anti join must hash on the key:\n$plan")
    // every sf0.001 user views, some have whale purchases — result must be
    // a strict, non-empty subset of viewers
    val nViewers = graft.Tables.events(spark, sf0001)
      .where(col("event_type") === "view").select("user_id").distinct().count()
    assert(df.count() > 0 && df.count() < nViewers)
  }

  test("docPacking: contiguous per-shard offsets, pack boundaries at the budget") {
    val budget = 100L
    val rows = graft.ops.Corpus.docPacking(spark, sf0001, budget = budget, shards = 4)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_.getAs[Long]("doc_id"))
      var expectedOff = 0L
      inOrder.foreach { r =>
        assert(r.getAs[Long]("start_off") === expectedOff, "offsets must concatenate gap-free")
        assert(r.getAs[Long]("pack_id") === expectedOff / budget)
        assert(r.getAs[Long]("pack_off") === expectedOff % budget)
        expectedOff += r.getAs[Long]("ntok")
      }
    }
    // sharding must actually spread docs
    assert(rows.map(_.getAs[Long]("shard")).distinct.length === 4)
  }

  test("packingEfficiency: per-shard report replays exactly from the packing layout") {
    val budget = 100L
    val layout = graft.ops.Corpus.docPacking(spark, sf0001, budget = budget, shards = 4)
      .collect()
    val got = graft.ops.Corpus.packingEfficiency(spark, sf0001, budget = budget, shards = 4)
      .collect()
      .map(r => r.getAs[Long]("shard") -> r).toMap
    assert(got.nonEmpty)
    layout.groupBy(_.getAs[Long]("shard")).foreach { case (shard, docs) =>
      val r = got(shard)
      val total = docs.map(_.getAs[Long]("ntok")).sum
      val nPacks = (total + budget - 1) / budget
      val crossing = docs.count(d =>
        d.getAs[Long]("pack_off") + d.getAs[Long]("ntok") > budget)
      assert(r.getAs[Long]("n_docs") === docs.length.toLong)
      assert(r.getAs[Long]("total_tokens") === total)
      assert(r.getAs[Long]("n_packs") === nPacks)
      assert(r.getAs[Long]("crossing_docs") === crossing.toLong)
      assert(math.abs(r.getAs[Double]("fill_ratio") -
        total.toDouble / (nPacks * budget)) < 1e-6)
      assert(r.getAs[Double]("fill_ratio") <= 1.0 &&
        r.getAs[Double]("fill_ratio") > 0.0)
      assert(math.abs(r.getAs[Double]("crossing_frac") -
        crossing.toDouble / docs.length) < 1e-6)
    }
    assert(got.keySet === layout.map(_.getAs[Long]("shard")).toSet,
      "one report row per populated shard")
  }

  test("harmonicPacking: pieces tile docs, no piece crosses a pack boundary, full packs meet the harmonic fill bound") {
    val budget = 64L
    val rows = graft.ops.Corpus.harmonicPacking(spark, sf0001, budget = budget, shards = 4)
      .collect()
    assert(rows.nonEmpty)
    // piece tiling: contiguous 0..n-1 per doc, sizes sum to the doc length,
    // remainder piece (if any) strictly last and the only sub-budget one
    // among a split doc's pieces
    val docLens = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS LONG) AS dtok")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dtok")).toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, ps) =>
      val sorted = ps.sortBy(_.getAs[Long]("piece"))
      assert(sorted.map(_.getAs[Long]("piece")).toSeq === (0L until ps.length.toLong),
        s"doc $id pieces not contiguous")
      assert(sorted.map(_.getAs[Long]("ntok")).sum === docLens(id), s"doc $id tiling")
      sorted.init.foreach(p => assert(p.getAs[Long]("ntok") === budget,
        s"doc $id: only the LAST piece may be sub-budget"))
    }
    // at this budget the corpus must actually exercise the split path
    assert(rows.groupBy(_.getAs[Long]("doc_id")).exists(_._2.length > 1),
      "fixture must contain a doc longer than the budget")
    // the two structural invariants the scaladoc claims by construction
    rows.foreach { r =>
      val (m, n) = (r.getAs[Long]("class_m"), r.getAs[Long]("ntok"))
      assert(m === budget / n, s"class assignment for size $n")
      assert(r.getAs[Long]("pack_off") + n <= budget,
        s"piece crosses the pack boundary: off=${r.getAs[Long]("pack_off")} size=$n")
    }
    // pack population: every pack except the last per (shard, class) holds
    // exactly class_m pieces, and those FULL packs beat the harmonic bound
    rows.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("class_m")))
      .foreach { case ((_, m), ps) =>
        val byPack = ps.groupBy(_.getAs[Long]("pack_seq"))
        val last = byPack.keys.max
        byPack.foreach { case (seq, members) =>
          if (seq < last) {
            assert(members.length.toLong === m, s"non-final pack $seq in class $m")
            val fill = members.map(_.getAs[Long]("ntok")).sum
            assert(fill.toDouble > budget.toDouble * m / (m + 1),
              s"full class-$m pack filled $fill / $budget under the harmonic bound")
          } else assert(members.length.toLong <= m)
        }
      }
  }

  test("rollingActiveUsers: trailing-7d distinct, windows anchored to real days") {
    val s = spark
    import s.implicits._
    val dir = tempDir("wau")
    // u1 day 0, u2 day 8, u3 day 5 → WAU(0)={u1}, WAU(5)={u1,u3}, WAU(8)={u2,u3}
    Seq((1L, 10L, 0L), (2L, 20L, 8L), (3L, 30L, 5L))
      .map { case (eid, uid, day) =>
        (eid, uid, "view", day * 86400L * 1000000000L, 1.0, "{}") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Analytics.rollingActiveUsers(spark, dir).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("active_7d")).toList
    assert(got === List(0L -> 1L, 5L -> 2L, 8L -> 2L))
  }

  test("eventsCube: grand total row equals the sum of detail rows") {
    val cube = Analytics.eventsCube(spark, sf0001).collect()
    val detail = cube.filter(_.getAs[Long]("gid") == 0L)
    val total = cube.filter(_.getAs[Long]("gid") == 3L)
    assert(total.length === 1)
    assert(total.head.getAs[Long]("n_events") === detail.map(_.getAs[Long]("n_events")).sum)
    // 4 grouping sets present
    assert(cube.map(_.getAs[Long]("gid")).distinct.sorted.toList === List(0L, 1L, 2L, 3L))
  }

  test("pplBuckets: terciles partition each language in perplexity order, nulls stay null") {
    val got = Relevance.pplBuckets(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        Option(r.getAs[java.lang.Double]("perplexity")).map(_.doubleValue()),
        Option(r.getAs[String]("bucket"))))
    assert(got.length.toLong === Tables.documents(spark, sf0001).count(),
      "one bucket row per doc")
    got.foreach { case (id, _, ppl, bucket) =>
      assert(ppl.isDefined === bucket.isDefined, s"doc $id: null ppl iff null bucket")
    }
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    for ((_, perLang) <- got.filter(_._3.isDefined).groupBy(_._2)) {
      val byBucket = perLang.groupBy(_._4.get)
      // closed thresholds: every head ppl <= every middle ppl <= every tail
      val maxOf = byBucket.view.mapValues(_.map(_._3.get).max).toMap
      val minOf = byBucket.view.mapValues(_.map(_._3.get).min).toMap
      for (Seq(lo, hi) <- Seq("head", "middle", "tail").filter(byBucket.contains).sliding(2)
           if order(lo) < order(hi))
        assert(maxOf(lo) <= minOf(hi), s"$lo max ${maxOf(lo)} > $hi min ${minOf(hi)}")
      // terciles: bucket sizes within the tie tolerance of n/3
      val n = perLang.length
      if (n >= 9) byBucket.foreach { case (b, rows) =>
        assert(math.abs(rows.length - n / 3.0) <= n / 6.0 + 1,
          s"bucket $b holds ${rows.length} of $n — not a tercile")
      }
    }
  }

  test("eventTransitions matches a local lag replay and rows normalize to one") {
    val got = Analytics.eventTransitions(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("prob"))).toMap
    // local replay: per-user (ts, event_id)-ordered adjacent pairs
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("tss"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq.sliding(2).collect {
        case Seq(a, b) => (a, b)
      }
    }.groupBy(p => p).view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap === want)
    // row-normalization: probabilities per prev_type sum to ~1 (round-6 each)
    got.keys.map(_._1).toSet.foreach { (prev: String) =>
      val sum = got.collect { case ((p, _), (_, prob)) if p == prev => prob }.sum
      assert(math.abs(sum - 1.0) < 1e-5, s"$prev: probs sum to $sum")
    }
  }

  test("eventAnomalies: planted spike z-scored against the prior week, thin/flat baselines null") {
    val s = spark
    import s.implicits._
    val dir = tempDir("anom")
    // click: 8,9,10,11,12,10,10 then a 50-event spike on day 7;
    // view: constant 5/day -> zero-variance baseline, z must stay null
    val clickDays = Seq(8, 9, 10, 11, 12, 10, 10, 50)
    val rows = for {
      (cnt, day) <- (clickDays.map(("click", _)) ++ Seq.fill(8)(("view", 5))).zipWithIndex
      d = day % 8
      i <- 0 until cnt._2
    } yield (day.toLong * 1000 + i,
      new java.sql.Timestamp((d.toLong * 86400L + i) * 1000L),
      i.toLong % 7, cnt._1, 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.ops.Analytics.eventAnomalies(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Long]("baseline_days"), Option(r.getAs[java.lang.Double]("z")),
          Option(r.getAs[java.lang.Boolean]("spike")))).toMap
    // spike day: n=7, s=70, ss=710 -> var=(710-4900/7)/6, z=(50-10)/sqrt(var)
    val varExp = (710.0 - 70.0 * 70.0 / 7.0) / 6.0
    val zExp = math.rint((50.0 - 10.0) / math.sqrt(varExp) * 1e6) / 1e6
    assert(got(("click", 7L)) === ((7L, Some(zExp), Some(true))))
    // day 3's baseline {8,9,10}: var=1, z=(11-9)/1=2 -> no spike
    assert(got(("click", 3L)) === ((3L, Some(2.0), Some(false))))
    // thin baselines (days 0-2) and the zero-variance view series stay null
    for (d <- 0L to 2L) assert(got(("click", d))._2.isEmpty, s"day $d must be null-z")
    for (d <- 3L to 7L) assert(got(("view", d))._2.isEmpty, "flat baseline has no z")
  }

  test("sourceQuality: a dup-heavy low-quality source is dropped, a clean one kept") {
    val s = spark
    import s.implicits._
    val dir = tempDir("srcq")
    val longText = (1 to 60).map(i => s"word$i").mkString(" ")
    val good = (0 until 10).map(i => (i.toLong, longText + s" unique$i", "en", "clean"))
    // spammy: 8 byte-identical copies + 2 ultra-short docs
    val spam = (10 until 18).map(i => (i.toLong, "buy now " + longText.take(20), "en", "spam")) ++
      Seq((18L, "x", "en", "spam"), (19L, "y z", "en", "spam"))
    (good ++ spam).map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextAnalysis.sourceQuality(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("dup_frac"), r.getAs[Boolean]("keep"))).toMap
    assert(got("clean")._1 === 10L && got("clean")._2 === 0.0 && got("clean")._3,
      s"clean source must keep: ${got("clean")}")
    // 8 copies -> 7 non-first duplicates of 10 docs = 0.7 dup fraction
    assert(got("spam")._2 === 0.7 && !got("spam")._3, s"spam source must drop: ${got("spam")}")
  }

  test("lastTouchAttribution matches a local carry-forward replay on the driver corpus") {
    val got = Analytics.lastTouchAttribution(spark, sf0001).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[java.lang.Long]("touch_id")).map(_.longValue()),
          Option(r.getAs[String]("touch_type")),
          Option(r.getAs[java.lang.Long]("secs_since_touch")).map(_.longValue()))).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("tss"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = scala.collection.mutable.Map.empty[Long, (Option[Long], Option[String], Option[Long])]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var touch: Option[(Long, String, Long)] = None
      // event_id order == time order (ts strictly increases with event_id)
      rows.sortBy(_._3).foreach { case (_, tss, id, tpe) =>
        if (tpe == "purchase") {
          want(id) = touch match {
            case Some((tid, ttype, ttss)) if tss - ttss <= 7L * 86400L =>
              (Some(tid), Some(ttype), Some(tss - ttss))
            case _ => (None, None, None)
          }
        }
        if (tpe == "view" || tpe == "click") touch = Some((id, tpe, tss))
      }
    }
    assert(got.keySet === want.keySet, "one row per purchase")
    assert(got === want.toMap)
    assert(got.values.exists(_._1.isDefined), "attribution must be non-vacuous at gate SF")
  }

  test("rfmSegments: quintile scores are monotone in their metric and compose the cell") {
    val got = Analytics.rfmSegments(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("recency_days"),
        r.getAs[Long]("frequency"), r.getAs[Double]("monetary"),
        r.getAs[Long]("r_score"), r.getAs[Long]("f_score"), r.getAs[Long]("m_score"),
        r.getAs[Long]("rfm_cell")))
    assert(got.nonEmpty)
    got.foreach { case (ck, _, _, _, r, f, m, cell) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5, s"cust $ck scores")
      assert(cell === r * 100 + f * 10 + m, s"cust $ck cell")
    }
    // monotone: more monetary can never mean a lower m_score (ties share a score)
    got.sortBy(_._4).map(_._7).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, "m_score must be monotone in monetary")
      case _ =>
    }
    got.sortBy(_._3).map(_._6).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b, "f_score must be monotone in frequency")
      case _ =>
    }
    // recency inverts: fewer days since last order -> HIGHER score
    got.sortBy(_._2).map(_._5).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "r_score must be anti-monotone in recency_days")
      case _ =>
    }
    // monetary is continuous: all five quintile scores must actually occur
    assert(got.map(_._7).distinct.sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L),
      "monetary quintiles cover 1..5")
  }

  test("purchaseIntervals matches a local lag-and-quantile replay") {
    val r = graft.ops.Analytics.purchaseIntervals(spark, sf0001).collect().head
    val ev = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .selectExpr("user_id", "event_id", "cast(ts as long) as s").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { rows =>
      val ss = rows.sortBy(_._2).map(_._3)
      ss.zip(ss.drop(1)).map { case (a, b) => b - a }
    }.toSeq
    val repeatUsers = ev.groupBy(_._1).count(_._2.length >= 2)
    def q(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt
      if (lo + 1 >= s.length) s.last else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    assert(r.getAs[Long]("repeat_users") === repeatUsers.toLong)
    assert(r.getAs[Long]("n_intervals") === gaps.length.toLong)
    assert(gaps.nonEmpty, "repeat purchases must exist at this SF")
    assert(math.abs(r.getAs[Double]("mean_hours") - gaps.sum.toDouble / gaps.length / 3600.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("p50_hours") - q(gaps, 0.5) / 3600.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("p90_hours") - q(gaps, 0.9) / 3600.0) < 1e-5)
  }

  /** Rank-error-bound check for the sketch quantiles, run at two regimes:
    * accuracy far above the population (sketch exact — the bound must be
    * trivially tight) and accuracy far BELOW it (the sketch actually
    * compresses — the regime the GK guarantee documents; ADVICE r12: the
    * high-accuracy-only test never exercised approximation at gate SF).
    */
  private def checkPurchaseIntervalsApprox(accuracy: Int,
                                           requireCompression: Boolean): Unit = {
    val r = graft.ops.Analytics.purchaseIntervalsApprox(spark, sf0001, accuracy).collect().head
    val ev = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .selectExpr("user_id", "event_id", "cast(ts as long) as s").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { rows =>
      val ss = rows.sortBy(_._2).map(_._3)
      ss.zip(ss.drop(1)).map { case (a, b) => b - a }
    }.toSeq
    assert(gaps.nonEmpty, "repeat purchases must exist at this SF")
    // non-quantile columns are sketch-independent and must be EXACT
    assert(r.getAs[Long]("n_intervals") === gaps.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_hours") - gaps.sum.toDouble / gaps.length / 3600.0) < 1e-5)
    // hour-space replay of the registered projection: round(gap/3600, 6) is
    // strictly monotone in integer-second gaps (adjacent gaps differ by
    // ≥ 1 s ≈ 2.8e-4 h >> the 5e-7 rounding half-step), so ranks computed
    // on the rounded hour values equal ranks on the raw seconds
    val hours = gaps.map(g => math.rint(g / 3600.0 * 1e6) / 1e6)
    val n = hours.length
    if (requireCompression)
      assert(n > 5 * accuracy,
        s"low-accuracy case must run in the compressing regime: n=$n vs accuracy=$accuracy")
    for ((p, colName) <- Seq(0.5 -> "p50_hours", 0.9 -> "p90_hours")) {
      val v = r.getAs[Double](colName)
      assert(hours.contains(v), s"$colName=$v must be an actual gap of the population")
      // Greenwald-Khanna guarantee: returned value's rank within n/accuracy
      // of the target rank (+1 slack for the rank-definition boundary)
      val eps = n.toDouble / accuracy + 1
      val below = hours.count(_ < v)
      val leq = hours.count(_ <= v)
      assert(below <= p * n + eps && leq >= p * n - eps,
        s"$colName=$v rank [$below,$leq] outside target ${p * n} ± $eps (n=$n)")
    }
  }

  test("purchaseIntervalsApprox: sketch quantiles stay within the rank-error bound of the gap population") {
    checkPurchaseIntervalsApprox(accuracy = 10000, requireCompression = false)
  }

  test("purchaseIntervalsApprox at accuracy=10: the COMPRESSING sketch still honors its rank bound") {
    checkPurchaseIntervalsApprox(accuracy = 10, requireCompression = true)
  }

  /** Same two-regime policy as [[checkPurchaseIntervalsApprox]]: the
    * disagreement loop only means something once accuracy sits below the
    * customer population and the sketch genuinely perturbs cutoffs.
    */
  private def checkRfmSegmentsApprox(accuracy: Int, requireCompression: Boolean): Unit = {
    val exact = Analytics.rfmSegments(spark, sf0001).collect()
      .map(r => r.getAs[Long]("custkey") -> r).toMap
    val approx = Analytics.rfmSegmentsApprox(spark, sf0001, accuracy).collect()
      .map(r => r.getAs[Long]("custkey") -> r).toMap
    assert(approx.keySet === exact.keySet, "same customer population")
    // base metric populations, for rank arithmetic
    def metric(name: String): Seq[Double] =
      exact.values.map(r => name match {
        case "recency_days" => r.getAs[Long]("recency_days").toDouble
        case "frequency"    => r.getAs[Long]("frequency").toDouble
        case "monetary"     => r.getAs[Double]("monetary")
      }).toSeq
    val n = exact.size
    if (requireCompression)
      assert(n > 5 * accuracy,
        s"low-accuracy case must run in the compressing regime: n=$n vs accuracy=$accuracy")
    // ε: GK's n/accuracy rank error, +2 for quantile_cont interpolation
    // sitting between adjacent samples and the <-vs-≤ rank boundary
    val eps = n.toDouble / accuracy + 2
    var disagreements = 0
    for ((metricCol, scoreCol) <- Seq("recency_days" -> "r_score",
           "frequency" -> "f_score", "monetary" -> "m_score")) {
      val xs = metric(metricCol)
      for (ck <- exact.keys) {
        val e = exact(ck).getAs[Long](scoreCol)
        val a = approx(ck).getAs[Long](scoreCol)
        // scores step one threshold at a time; a sketch perturbs each
        // cutoff independently, so approx can differ from exact only by
        // crossing cutoffs the metric value sits between — and every such
        // crossed cutoff p has the customer's value inside its GK rank
        // window. Checking the NEAREST crossed thresholds covers all.
        if (a != e) {
          disagreements += 1
          val v = metricCol match {
            case "recency_days" => exact(ck).getAs[Long]("recency_days").toDouble
            case "frequency"    => exact(ck).getAs[Long]("frequency").toDouble
            case "monetary"     => exact(ck).getAs[Double]("monetary")
          }
          // r_score counts cutoffs ABOVE v (anti-monotone), f/m count
          // below — either way score s means v sits between the (s-1)th
          // and sth cutoff, so a flip means v straddles some quintile
          // boundary p: assert v is within the rank window of AT LEAST
          // one boundary
          val below = xs.count(_ < v)
          val leq = xs.count(_ <= v)
          val nearBoundary = Seq(0.2, 0.4, 0.6, 0.8).exists { p =>
            below <= p * n + eps && leq >= p * n - eps
          }
          assert(nearBoundary,
            s"$scoreCol cust $ck: approx=$a exact=$e but $metricCol=$v " +
              s"rank [$below,$leq] is not within ±$eps of any quintile boundary (n=$n)")
        }
      }
    }
    info(s"$disagreements boundary-window score disagreements across ${3 * n} scores " +
      s"(accuracy=$accuracy)")
  }

  test("rfmSegmentsApprox: score disagreements vs exact only at metrics inside a cutoff's rank-error window") {
    checkRfmSegmentsApprox(accuracy = 10000, requireCompression = false)
  }

  test("rfmSegmentsApprox at accuracy=10: the COMPRESSING sketch's flips all sit in rank windows") {
    checkRfmSegmentsApprox(accuracy = 10, requireCompression = true)
  }

  test("newVsReturning: a user is new exactly once and day totals decompose") {
    val got = graft.ops.Analytics.newVsReturning(spark, sf0001).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("active_users"), r.getAs[Long]("new_users"), r.getAs[Long]("returning_users")))
    val ev = Tables.events(spark, sf0001)
      .selectExpr("user_id", "cast(ts as long) div 86400 as day").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val first = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = ev.groupBy(_._2).map { case (day, rows) =>
      val nw = rows.count { case (u, d) => first(u) == d }.toLong
      day -> (rows.length.toLong, nw, rows.length - nw)
    }
    assert(got.toMap === want)
    assert(got.map(_._2._2).sum === first.size.toLong,
      "summed new_users must equal the distinct user population")
    assert(got.toMap.keySet.size > 1 && got.exists(_._2._3 > 0), "returning users exist at this SF")
  }

  test("basketAffinity matches a local pair-count replay with exact lifts") {
    val got = graft.ops.Analytics.basketAffinity(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("pair_cnt"), r.getAs[Double]("lift")))
    val baskets = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length.toDouble
    val freq = baskets.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val pairCnt = baskets.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 3)
    val want = pairCnt.toSeq.map { case ((a, b), c) =>
      (a, b, c.toLong,
        BigDecimal(c * nOrders / (freq(a) * freq(b)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (a, b, c, l) => (-c, -l, a, b) }.take(50)
    assert(got.toSeq === want, "ranked pair list must match the local replay exactly")
    assert(got.nonEmpty, "min-support pairs must exist at this SF")
  }

  test("eventPaths matches a local consecutive-triple replay") {
    val got = graft.ops.Analytics.eventPaths(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("n_paths"), r.getAs[Long]("n_users")))
    val ev = Tables.events(spark, sf0001).select("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val triples = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      rows.sortBy(_._2).map(_._3).sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2), uid)).toSeq
    }
    val want = triples.groupBy(t => (t._1, t._2, t._3)).map { case (k, vs) =>
      (k._1, k._2, k._3, vs.size.toLong, vs.map(_._4).distinct.size.toLong)
    }.toSeq.sortBy { case (a, b, c, n, _) => (-n, a, b, c) }.take(25)
    assert(got.toSeq === want, "top-25 paths must match the local replay exactly")
  }

  test("winsorizedStats: clipped counts and both means match a local quantile replay") {
    val got = graft.ops.Analytics.winsorizedStats(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val raw = Tables.orders(spark, sf0001).select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def quantile(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt
      if (lo + 1 >= s.length) s.last else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    raw.groupBy(_._1).foreach { case (prio, rows) =>
      val xs = rows.map(_._2).toSeq
      val (lo, hi) = (quantile(xs, 0.01), quantile(xs, 0.99))
      val r = got(prio)
      assert(r.getAs[Long]("n_orders") === xs.length.toLong)
      assert(r.getAs[Long]("n_clipped_low") === xs.count(_ < lo).toLong, s"$prio low")
      assert(r.getAs[Long]("n_clipped_high") === xs.count(_ > hi).toLong, s"$prio high")
      val meanRaw = xs.sum / xs.length
      val meanWin = xs.map(x => if (x < lo) lo else if (x > hi) hi else x).sum / xs.length
      assert(math.abs(r.getAs[Double]("mean_raw") - meanRaw) < 1e-4, s"$prio mean_raw")
      assert(math.abs(r.getAs[Double]("mean_winsor") - meanWin) < 1e-4, s"$prio mean_winsor")
      // winsorization pulls the mean toward the body, never past the cutoffs
      assert(r.getAs[Double]("mean_winsor") >= lo && r.getAs[Double]("mean_winsor") <= hi)
    }
  }

  test("langConfusion is exactly the langId output aggregated, and shares sum to one") {
    val got = graft.ops.TextAnalysis.langConfusion(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("frac_of_declared"))).toMap
    val perDoc = graft.ops.TextAnalysis.langId(spark, sf0001).collect()
      .map(r => (r.getAs[String]("lang_declared"), r.getAs[String]("lang_pred")))
    val want = perDoc.groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    assert(got.view.mapValues(_._1).toMap === want, "cells must aggregate langId exactly")
    perDoc.map(_._1).distinct.foreach { decl =>
      val fracSum = got.collect { case ((d, _), (_, f)) if d == decl => f }.sum
      assert(math.abs(fracSum - 1.0) < 1e-5, s"$decl shares sum to 1, got $fracSum")
    }
  }

  test("bm25Search matches a full local Okapi replay: same docs, same order, same scores") {
    val terms = Seq("spark", "window", "merge")
    val topK = 50
    val got = graft.ops.Relevance.bm25Search(spark, sf0001, terms, topK = topK).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"), r.getAs[Double]("score")))
    assert(got.length === topK)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    val want = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toDouble
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else Some(math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.length.toLong,
        BigDecimal(contribs.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.sortBy { case (id, _, s) => (-s, id) }.take(topK)
    assert(got.map(_._1).toSeq === want.map(_._1).toSeq, "same ranking")
    got.zip(want).foreach { case ((_, nt1, s1), (_, nt2, s2)) =>
      assert(nt1 === nt2)
      assert(math.abs(s1 - s2) < 2e-6, s"score drift: $s1 vs $s2")
    }
  }

  test("phraseOccurrences pins exact positions of an explicit phrase") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x a b c y a b c", "s1"),
      (2L, "a b c starts here and never repeats", "s1"),
      (3L, "no match at all in this one", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Relevance.phraseOccurrences(docs, "a b c").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (1L, 6L), (2L, 1L)))
  }

  test("phraseSearch finds every occurrence of the corpus-dominant 5-gram") {
    val rows = Relevance.phraseSearch(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val n = rows.head.getAs[Long]("n_occurrences")
    assert(rows.length.toLong === n, "one row per occurrence of the dominant gram")
    // local verification: the 5-gram at each reported position is the SAME
    // string everywhere, and it is the most frequent 5-gram in the corpus
    val texts = Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val grams = rows.map { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val p = r.getAs[Long]("pos").toInt - 1
      t.slice(p, p + 5).mkString(" ")
    }
    assert(grams.toSet.size === 1, s"all occurrences must be one literal gram: ${grams.toSet}")
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.values.foreach { t =>
      val upper = math.max(t.length - 4, 1)
      (0 until upper).foreach { i =>
        val g = t.slice(i, i + 5).mkString(" ")
        counts(g) = counts.getOrElse(g, 0L) + 1
      }
    }
    assert(counts.values.max === n, "the reported gram is the most frequent")
  }

  test("hybridSearch: full independent local replay of BM25 + cosine + RRF") {
    val queries = Seq(0L -> Seq("spark", "window", "merge"),
                      1L -> Seq("customer", "join", "stream"))
    val got = Relevance.hybridSearch(spark, sf0001).collect().toSeq.map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))
    }
    assert(got.size === queries.size * 10)

    // plain-Scala recomputation, token-for-token the registered arithmetic
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val embs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val allTerms = queries.flatMap(_._2).toSet
    val toks = docs.map { case (id, t) => (id, t.split(" ", -1)) }
    val nDocs = toks.length
    val dl = toks.map { case (id, ts) => (id, ts.length.toLong) }.toMap
    val avgdl = dl.values.sum.toDouble / nDocs
    val tf: Map[(Long, String), Long] = toks.flatMap { case (id, ts) =>
      ts.filter(allTerms).groupBy(identity)
        .map { case (w, occ) => ((id, w), occ.length.toLong) }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (w, ks) => (w, ks.size.toLong) }
    def lexRanks(q: Long, terms: Seq[String]): Map[Long, Long] = {
      val scored = toks.map(_._1).filter(_ != q).flatMap { d =>
        val parts = terms.flatMap(w => tf.get((d, w)).map { t =>
          val dfi = df(w)
          val idf = math.log(1.0 + (nDocs - dfi + 0.5) / (dfi + 0.5))
          idf * (t * (1.2 + 1.0)) /
            (t + 1.2 * (1.0 - 0.75 + 0.75 * dl(d) / avgdl))
        })
        if (parts.isEmpty) None else Some((d, round6(parts.sum)))
      }
      scored.sortBy { case (d, s) => (-s, d) }.take(50)
        .zipWithIndex.map { case ((d, _), i) => (d, i + 1L) }.toMap
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val embMap = embs.toMap
    def semRanks(q: Long): Map[Long, Long] = {
      val qv = embMap(q)
      embs.filter(_._1 != q).map { case (id, v) => (id, round6(cos(v, qv))) }
        .sortBy { case (d, c) => (-c, d) }.take(50)
        .zipWithIndex.map { case ((d, _), i) => (d, i + 1L) }.toMap
    }
    val expected = queries.flatMap { case (q, terms) =>
      val lex = lexRanks(q, terms)
      val sem = semRanks(q)
      (lex.keySet ++ sem.keySet).toSeq.map { d =>
        val rrf = round6(
          lex.get(d).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          sem.get(d).map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
        (d, rrf)
      }.sortBy { case (d, rrf) => (-rrf, d) }.take(10).zipWithIndex.map {
        case ((d, rrf), i) => (q, i + 1L, d, rrf, lex.get(d), sem.get(d))
      }
    }
    assert(got.sortBy(t => (t._1, t._2)) === expected.sortBy(t => (t._1, t._2)))
  }

  test("hybridSearchIvf: fusion replays from the independently-oracled IVF pool + plain-Scala lexical ranks and RRF") {
    val queries = Seq(0L -> Seq("spark", "window", "merge"),
                      1L -> Seq("customer", "join", "stream"))
    val got = Relevance.hybridSearchIvf(spark, sf0001).collect().toSeq.map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))
    }
    assert(got.size === queries.size * 10)
    // semantic ranks from the SAME IVF machinery the hash-green
    // `ann_ivf_topk` oracle verifies (deterministic k-means, so a second
    // build reproduces the pool bit-for-bit)
    val sem: Map[(Long, Long), Long] = graft.ops.Similarity
      .ivfTopKOf(graft.Tables.embeddings(spark, sf0001),
        nQueries = 2, k = 50, cells = 16, nprobe = 4, dim = 64)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Long]("rank")).toMap
    // lexical ranks replayed in plain Scala (the exact-hybrid test's replay)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val allTerms = queries.flatMap(_._2).toSet
    val toksL = docs.map { case (id, t) => (id, t.split(" ", -1)) }
    val nDocs = toksL.length
    val dl = toksL.map { case (id, ts) => (id, ts.length.toLong) }.toMap
    val avgdl = dl.values.sum.toDouble / nDocs
    val tfL: Map[(Long, String), Long] = toksL.flatMap { case (id, ts) =>
      ts.filter(allTerms).groupBy(identity)
        .map { case (w, occ) => ((id, w), occ.length.toLong) }
    }.toMap
    val dfL: Map[String, Long] =
      tfL.keys.groupBy(_._2).map { case (w, ks) => (w, ks.size.toLong) }
    def lexRanks(q: Long, terms: Seq[String]): Map[Long, Long] = {
      val scored = toksL.map(_._1).filter(_ != q).flatMap { d =>
        val parts = terms.flatMap(w => tfL.get((d, w)).map { t =>
          val dfi = dfL(w)
          val idf = math.log(1.0 + (nDocs - dfi + 0.5) / (dfi + 0.5))
          idf * (t * (1.2 + 1.0)) /
            (t + 1.2 * (1.0 - 0.75 + 0.75 * dl(d) / avgdl))
        })
        if (parts.isEmpty) None else Some((d, round6(parts.sum)))
      }
      scored.sortBy { case (d, s) => (-s, d) }.take(50)
        .zipWithIndex.map { case ((d, _), i) => (d, i + 1L) }.toMap
    }
    val expected = queries.flatMap { case (q, terms) =>
      val lex = lexRanks(q, terms)
      val semQ = sem.collect { case ((`q`, d), r) => d -> r }.toMap
      (lex.keySet ++ semQ.keySet).toSeq.map { d =>
        val rrf = round6(
          lex.get(d).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          semQ.get(d).map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
        (d, rrf)
      }.sortBy { case (d, rrf) => (-rrf, d) }.take(10).zipWithIndex.map {
        case ((d, rrf), i) => (q, i + 1L, d, rrf, lex.get(d), semQ.get(d))
      }
    }
    assert(got.sortBy(t => (t._1, t._2)) === expected.sortBy(t => (t._1, t._2)))
  }

  test("lmTrigramPerplexity: hand-checkable interpolated model; short docs keep null rows") {
    val dir = tempDir("lmtri")
    // corpus: two identical 3-token docs + one 2-token doc (no trigrams).
    // trigram (a,b,c): c3 = 2, cx3(a,b) = 2 → p3 = 1
    // bigram (b,c): cb = 2, cx2(b·) = 2 → p2 = 1
    // unigram c: c1 = 3 (both "a b c" docs AND "x c"), N = 8 tokens,
    // V = 4 → p1 = (3+0.5)/(8+0.5·4) = 0.35
    // p = 0.6·1 + 0.3·1 + 0.1·0.35 = 0.935; ce = −ln(0.935)
    writeDocs(dir, Seq((1L, "a b c"), (2L, "a b c"), (3L, "x c")))
    val m = Relevance.lmTrigramPerplexity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m.size === 3)
    assert(m(1L).getAs[Long]("n_trigrams") === 1L)
    val expCe = math.rint(-math.log(0.6 * 1.0 + 0.3 * 1.0 + 0.1 * 0.35) * 1e6) / 1e6
    assert(m(1L).getAs[Double]("cross_entropy") === expCe)
    assert(m(1L).getAs[Double]("cross_entropy") === m(2L).getAs[Double]("cross_entropy"))
    assert(m(3L).getAs[Long]("n_trigrams") === 0L, "a 2-token doc has no trigrams")
    assert(m(3L).isNullAt(m(3L).fieldIndex("perplexity")))
  }

  test("lmTrigramPerplexity separates shuffled text the bigram model underseparates") {
    val dir = tempDir("lmtri2")
    val sentence = "the cat sat on the mat today"
    writeDocs(dir, Seq(
      (1L, sentence), (2L, sentence), (3L, sentence), (4L, sentence),
      (5L, "mat the on sat cat today the")))
    val tri = Relevance.lmTrigramPerplexity(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("perplexity")).toMap
    assert(tri(5L) > tri(1L),
      s"shuffled transitions must score higher trigram perplexity: ${tri(5L)} vs ${tri(1L)}")
    assert(tri(1L) === tri(4L), "identical docs score identically")
    // and it is fully scored on the driver corpus (≥3-token docs)
    val rows = Relevance.lmTrigramPerplexity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("cross_entropy"))))
  }

  test("codeSwitch: a planted mixed-language doc is flagged; pure and evidence-free docs are not") {
    val dir = tempDir("codesw")
    writeDocs(dir, Seq(
      // en-dominant with a real de block: 4 en hits, 3 de hits of 12 tokens
      (1L, "the cat of the house and der hund von der strasse x"),
      // pure en: runner-up evidence is zero
      (2L, "the cat of the house and it is on a mat"),
      // no stopwords at all: zero evidence either way
      (3L, "qqq www eee rrr"),
      // de-primary with trace en (1 hit): under the min-hits floor
      (4L, "der hund und die katze von der strasse the end")))
    val m = graft.ops.TextAnalysis.codeSwitch(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[String]("primary_lang") === "en")
    assert(m(1L).getAs[String]("secondary_lang") === "de")
    assert(m(1L).getAs[Long]("secondary_hits") === 3L) // der ×2 + von
    assert(m(1L).getAs[Boolean]("code_switched"), "mixed doc must flag")
    assert(m(2L).getAs[String]("primary_lang") === "en")
    assert(!m(2L).getAs[Boolean]("code_switched"), "pure doc must not flag")
    assert(m(3L).getAs[Long]("primary_hits") === 0L)
    assert(!m(3L).getAs[Boolean]("code_switched"), "zero evidence never flags")
    assert(m(4L).getAs[String]("primary_lang") === "de")
    assert(!m(4L).getAs[Boolean]("code_switched"),
      "a single foreign stopword is under the min-hits floor")
  }
}
