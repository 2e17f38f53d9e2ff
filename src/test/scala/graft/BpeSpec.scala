package graft

import graft.ops.Bpe

class BpeSpec extends SparkSpec {

  /** Independent single-machine BPE over a word-frequency list — a second
    * implementation of the Sennrich procedure (mutable counts map, minBy
    * argmax) sharing no code with the distributed learner except the
    * public applyMerge rewrite. The distributed result must match its
    * merge sequence exactly, freqs included.
    */
  private def refBpe(freqs: Seq[(String, Long)], merges: Int,
                     minFreq: Long): Seq[(String, String, Long)] = {
    var words: Seq[(Seq[String], Long)] =
      freqs.map { case (w, f) => (w.map(_.toString).toList :+ Bpe.EndOfWord, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.size < merges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (s, f) =>
        s.zip(s.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (f < minFreq) continue = false
        else {
          out += ((l, r, f))
          words = words.map { case (s, fr) => (Bpe.applyMerge(s, l, r), fr) }
        }
      }
    }
    out.toSeq
  }

  test("distributed BPE learns the exact merge sequence of an independent implementation") {
    import org.apache.spark.sql.functions._
    val got = Bpe.learn(spark, sf0001, merges = 12).collect()
      .map(r => (r.getAs[Long]("rank"), r.getString(1), r.getString(2),
        r.getString(3), r.getAs[Long]("freq")))
    val freqs = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toSeq
    val want = refBpe(freqs, merges = 12, minFreq = 2L)
    assert(got.length === want.length)
    got.zip(want).zipWithIndex.foreach { case (((rk, l, r, m, f), (wl, wr, wf)), i) =>
      assert(rk === i + 1L)
      assert((l, r, f) === ((wl, wr, wf)), s"merge ${i + 1} diverged")
      assert(m === l + r)
    }
    assert(got.length === 12, "the sf0.001 corpus supports at least 12 merges")
  }

  test("local merge loop (vocab under the driver cap) equals the distributed RDD loop exactly") {
    import org.apache.spark.sql.functions._
    val texts = Tables.documents(spark, sf0001).select(col("text"))
    // localVocabCap = 0 forces the distributed path on the same corpus the
    // default (local, vocab ~31 << 64k) path serves — the two must learn
    // the identical merge sequence, tie-breaks and stop condition included
    val localRows = Bpe.learnFrom(texts, merges = 12, minPairFreq = 2L).collect()
    val distRows = Bpe.learnFrom(texts, merges = 12, minPairFreq = 2L,
      localVocabCap = 0L).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("rank"), r.getString(1), r.getString(2), r.getString(3),
        r.getAs[Long]("freq"))
    assert(localRows.map(key).toSeq === distRows.map(key).toSeq,
      "driver-local and RDD merge loops diverged")
    assert(localRows.length === 12)
  }

  test("hand corpus: ties break lexicographically, full merge then stop") {
    val s = spark
    import s.implicits._
    // one word type "ab" x3: pairs (a,b) and (b,</w>) tie at 3 — (a,b)
    // wins lexicographically; two merges exhaust the word, round 3 stops
    val texts = Seq("ab ab", "ab").toDF("text")
    val got = Bpe.learnFrom(texts, merges = 10, minPairFreq = 2L).collect()
      .map(r => (r.getString(1), r.getString(2), r.getAs[Long]("freq")))
    assert(got.toSeq === Seq(("a", "b", 3L), ("ab", Bpe.EndOfWord, 3L)))
  }

  test("minPairFreq stops before learning singleton merges") {
    val s = spark
    import s.implicits._
    val texts = Seq("abc xyz qrs").toDF("text") // every pair occurs once
    assert(Bpe.learnFrom(texts, merges = 10, minPairFreq = 2L).count() === 0L)
  }

  test("learn constructs lazily behind a deferred leaf") {
    val df = Bpe.learn(spark, sf0001)
    assert(df.queryExecution.logical.isInstanceOf[graft.plans.DeferredRelation])
  }

  test("property: encode/merge rewrites never change the word they spell") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random words over a small alphabet (so merges actually apply) plus a
    // random learned merge list; the invariant every BPE rewrite must keep:
    // concatenating the tokens (minus the terminal) re-spells the word
    val word = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val pair = for {
      l <- Gen.oneOf("a", "b", "c", "ab", "bc", "ca", "abc")
      r <- Gen.oneOf("a", "b", "c", Bpe.EndOfWord, "ab", "bc")
    } yield (l, r)
    val cases = Gen.listOfN(300, for {
      w <- word
      ms <- Gen.chooseNum(0, 6).flatMap(k => Gen.listOfN(k, pair))
    } yield (w, ms)).pureApply(Gen.Parameters.default, Seed(42L))
    cases.foreach { case (w, ms) =>
      val toks = Bpe.encodeWord(w, ms)
      assert(toks.mkString.stripSuffix(Bpe.EndOfWord) === w,
        s"'$w' under $ms re-spelled as ${toks.mkString("|")}")
      assert(toks.last.endsWith(Bpe.EndOfWord), "terminal symbol survives at the end")
    }
  }

  test("encodeWord: zero merges yields chars + terminal; full merges collapse the word") {
    assert(Bpe.encodeWord("abc", Nil) === Seq("a", "b", "c", Bpe.EndOfWord))
    val merges = Seq(("a", "b"), ("ab", "c"), ("abc", Bpe.EndOfWord))
    assert(Bpe.encodeWord("abc", merges) === Seq("abc" + Bpe.EndOfWord))
  }

  test("encode applies the corpus-learned merges: hand corpus collapses to one token per word") {
    val s = spark
    import s.implicits._
    val dir = tempDir("bpeenc")
    Seq((1L, "ab ab", "en", "src", 5L), (2L, "ab", "en", "src", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // learn finds (a,b) then (ab,</w>): every "ab" encodes to ONE token
    val got = Bpe.encode(spark, dir, merges = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("tokens_per_word")))
    assert(got.toSeq === Seq((1L, 2L, 2L, 1.0), (2L, 1L, 1L, 1.0)))
  }

  test("distributed encode matches a local word-by-word replay on the corpus") {
    import org.apache.spark.sql.functions._
    val merges = 8
    val got = Bpe.encode(spark, sf0001, merges = merges).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    // merges from the independent learner, applied word-by-word locally
    val freqs = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toSeq
    val learned = refBpe(freqs, merges, 2L).map { case (l, r, _) => (l, r) }
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { row =>
      val want = row.getString(1).split(" ").filter(_.nonEmpty)
        .map(w => Bpe.encodeWord(w, learned).length.toLong).sum
      assert(got(row.getLong(0)) === want, s"doc ${row.getLong(0)} token count diverged")
    }
  }

  test("fertility aggregates the verified per-doc encode by language exactly") {
    val got = Bpe.fertility(spark, sf0001, merges = 16).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("tokens_per_word"),
        r.getAs[Double]("chars_per_token"))).toMap
    val perDoc = Bpe.encode(spark, sf0001, merges = 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))).toMap
    val meta = Tables.documents(spark, sf0001).select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = meta.groupBy(_._2).map { case (lang, rows) =>
      val (w, t, c) = (rows.map(r => perDoc(r._1)._1).sum, rows.map(r => perDoc(r._1)._2).sum,
        rows.map(_._3).sum)
      lang -> (rows.length.toLong, w, t,
        BigDecimal(t.toDouble / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(c.toDouble / t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got === want)
    // fertility is a real signal: every language pays at least one token per word
    got.values.foreach { case (_, _, _, tpw, cpt) => assert(tpw >= 1.0 && cpt > 0.0) }
  }
}
