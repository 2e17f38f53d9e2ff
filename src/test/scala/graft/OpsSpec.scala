package graft

import graft.events.{ChangeEvents, ResumeTokens}
import graft.ops.{Analytics, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Operator-level behaviors not fully covered by the DuckDB oracle:
  * multimodal decode batching, plan shapes, envelope invariants.
  */
class OpsSpec extends SparkSpec {

  test("multimodal decode: batched stub produces typed features for every row") {
    val media = Multimodal.mediaTable(spark, sf0001)
    // mediaSchema documents the table's contract — keep them from drifting
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val out = Multimodal.decodeFeatures(media)
    assert(out.columns.toSeq === Seq("doc_id", "kind", "n_bytes", "width", "height", "mean_luma"))
    val n = media.count()
    assert(out.count() === n)
    val r = out.where(col("doc_id") === 0).collect().head
    assert(r.getAs[String]("kind") === "image")
    assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 80)
    assert(r.getAs[Double]("mean_luma") > 0)
    // deterministic: same input, same features
    val again = Multimodal.decodeFeatures(media).where(col("doc_id") === 0).collect().head
    assert(again === r)
  }

  test("multimodal REAL image decode: an in-test PNG decodes bit-exactly via JDK ImageIO; non-image payloads fall back to the stub") {
    val s = spark
    import s.implicits._
    // generate a genuine 5x3 PNG with known pixels — no fixture file, no
    // new dependency (BufferedImage + ImageIO ship in the JDK)
    val (w, h) = (5, 3)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 50) << 16) | ((y * 80) << 8) | ((x + y) * 20))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK must carry a PNG writer")
    val png = bos.toByteArray
    // the bit-exact expectation, replayed locally with the same Rec. 601
    // arithmetic in the same row-major order
    var expLuma = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      expLuma += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
    }
    expLuma /= (w * h).toDouble
    val media = Seq(
      (1L, "image", png),
      (2L, "image", "not an image container".getBytes("UTF-8"))
    ).toDF("doc_id", "kind", "payload")
    val got = Multimodal.decodeRealFeatures(media).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("decoder"), r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Double]("mean_luma"), r.getAs[Int]("n_bytes"))).toMap
    assert(got(1L)._1 === "imageio", "a real PNG must decode via the real codec")
    assert(got(1L)._2 === w && got(1L)._3 === h, "true raster dimensions")
    assert(got(1L)._4 === expLuma, "mean luma must match the local replay bit-for-bit")
    assert(got(1L)._5 === png.length)
    assert(got(2L)._1 === "stub", "undecodable bytes fall back to the documented stub")
    // the fallback's features equal the stub path exactly (one seam, two codecs)
    val stubRow = Multimodal.decodeFeatures(media.where(col("doc_id") === 2L))
      .collect().head
    assert((got(2L)._2, got(2L)._3, got(2L)._4) ===
      ((stubRow.getAs[Int]("width"), stubRow.getAs[Int]("height"),
        stubRow.getAs[Double]("mean_luma"))))
  }

  test("multimodal: media bytes survive the pipeline untouched (sha matches source text)") {
    val meta = Multimodal.mediaMeta(spark, sf0001).where(col("doc_id") === 1).collect().head
    val doc = Tables.documents(spark, sf0001).where(col("doc_id") === 1).collect().head
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest(doc.getAs[String]("text").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(meta.getAs[String]("content_sha256") === expected)
  }

  test("multimodal resize + frame-sample stubs keep schema and row-shape contracts") {
    val media = Multimodal.mediaTable(spark, sf0001)
    val resized = Multimodal.resizeStub(media, maxSide = 32)
    assert(resized.columns.toSeq === Seq("doc_id", "kind", "out_w", "out_h", "payload"))
    assert(resized.count() === media.count())
    val tooBig = resized.where(col("out_w") > 32 || col("out_h") > 32).count()
    assert(tooBig === 0, "resize must bound both sides")
    val frames = Multimodal.frameSample(media, everyNth = 10)
    // videos explode to multiple frames, others exactly one
    val nonVideo = frames.where(col("kind") =!= "video")
      .groupBy("doc_id").count().where(col("count") =!= 1).count()
    assert(nonVideo === 0)
    assert(frames.where(col("kind") === "video").count() >
      media.where(col("kind") === "video").count(), "videos produce multiple frames")
  }

  test("change-event envelope: operation_type covers every event_type deterministically") {
    val ops = ChangeEvents.normalize(spark, sf0001)
      .groupBy("operation_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.keySet === Set("insert", "update", "delete"))
    assert(ops.values.sum === Tables.events(spark, sf0001).count())
  }

  test("q5 plan broadcasts the dimension chain and pushes filters into scans") {
    val plan = Analytics.q5Join(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)"),
      s"region filter not pushed:\n$plan")
  }

  test("q1 reads only the columns it needs (projection pruning reaches the scan)") {
    val plan = Analytics.q1Agg(spark, sf0001).queryExecution.executedPlan.toString
    val scanSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_partkey") && !scanSchema.contains("l_comment"),
      s"scan reads unused columns: $scanSchema")
    assert(scanSchema.contains("l_quantity"))
  }

  test("vocab_top takes its top-k without a global sort (TakeOrdered in plan)") {
    val plan = graft.ops.Corpus.vocabTop(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered top-k:\n$plan")
  }

  test("doc_chunks shuffles only for the verification ORDER BY") {
    val plan = graft.ops.Corpus.chunk(spark, sf0001).queryExecution.executedPlan.toString
    // REPARTITION_BY_NUM is the read layer spreading a single-row-group
    // scan (Tables.spread), not a cost the chunking operator added.
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("REPARTITION_BY_NUM"))
    assert(exchanges <= 1, s"chunking itself must not shuffle:\n$plan")
  }

  test("doc_chunks covers every token with the configured overlap") {
    // pick the longest doc so the multi-chunk path is actually exercised
    val target = Tables.documents(spark, sf0001)
      .orderBy(size(split(col("text"), " ")).desc, col("doc_id")).limit(1)
      .select("doc_id", "text").collect().head
    val docId = target.getLong(0)
    val out = graft.ops.Corpus.chunk(spark, sf0001, window = 64, overlap = 8)
      .where(col("doc_id") === docId).collect()
    val doc = target.getString(1)
    val toks = doc.split(" ", -1)
    val rebuilt = out.sortBy(_.getAs[Long]("chunk_id")).zipWithIndex.flatMap { case (r, i) =>
      val ct = r.getAs[String]("chunk_text").split(" ", -1)
      if (i == 0) ct else ct.drop(8) // later chunks repeat the 8-token overlap
    }
    assert(rebuilt.toSeq === toks.toSeq, "chunks must tile the document exactly")
  }

  test("approx token percentiles stay within the sketch's rank-error bound of exact") {
    val accuracy = 10000
    val approx = Analytics.tokenPercentilesApprox(spark, sf0001, accuracy).collect()
    assert(approx.nonEmpty)
    val ntoks = Tables.documents(spark, sf0001)
      .select(col("lang"), size(split(col("text"), " ")).cast("double").as("ntok"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for {
      r <- approx
      (p, colName) <- Seq(0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    } {
      val xs = ntoks(r.getAs[String]("lang"))
      val v = r.getAs[Double](colName)
      val n = xs.length
      assert(xs.contains(v), s"$colName=$v must be an actual sample of the group")
      // Greenwald-Khanna guarantee: returned value's rank within n/accuracy
      // of the target rank (+1 slack for the rank-definition boundary)
      val eps = n.toDouble / accuracy + 1
      val below = xs.count(_ < v)
      val leq = xs.count(_ <= v)
      assert(below <= p * n + eps && leq >= p * n - eps,
        s"$colName=$v rank [$below,$leq] outside target ${p * n} ± $eps (n=$n)")
    }
  }

  test("resume_after replays exactly the events past each stream's checkpoint") {
    val out = ResumeTokens.resumeAfter(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    // every replayed event is strictly after its stream's checkpoint
    assert(out.where(col("event_id") <= col("checkpoint_offset")).count() === 0)
    // and nothing at/before the global midpoint that belongs to a checkpointed stream is replayed twice
    val total = ev.count()
    assert(out.count() > 0 && out.count() < total)
  }

  test("text analysis agrees with the documents table's own n_chars") {
    val bad = TextAnalysis.tokenCount(spark, sf0001)
      .join(Tables.documents(spark, sf0001), "doc_id")
      .where(col("n_chars_computed") =!= col("n_chars")).count()
    assert(bad === 0)
  }

  test("compressionRatio: exact in-JVM Deflater replay; both suspect tails flagged") {
    val s = spark
    import s.implicits._
    // corpus: every row replays bit-exactly against a local Deflater
    val got = TextAnalysis.compressionRatio(spark, sf0001).collect()
    assert(got.nonEmpty)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def deflateLen(text: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        d.finish()
        val buf = new Array[Byte](8192)
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total
      } finally d.end()
    }
    got.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
      val dz = deflateLen(t)
      assert(r.getAs[Long]("n_bytes") === bytes)
      assert(r.getAs[Long]("n_deflate") === dz,
        s"doc ${r.getAs[Long]("doc_id")}: deflate ${r.getAs[Long]("n_deflate")} vs local $dz")
      val ratio = BigDecimal(bytes.toDouble / dz)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("ratio") === ratio)
      assert(r.getAs[Boolean]("keep") === (ratio >= 1.5 && ratio <= 4.0))
    }
    // fixture tails: sub-token repetition compresses far past the bracket;
    // high-entropy noise barely compresses — both rejected, prose kept
    val rng = new scala.util.Random(7)
    val dir = tempDir("compress")
    Seq((1L, "ab" * 600, "en", "s", 1L),
        (2L, Seq.fill(150)(Seq.fill(10)((33 + rng.nextInt(94)).toChar)
          .mkString.replace(' '.toString, "!")).mkString(" "), "en", "s", 2L),
        (3L, "the quick brown fox jumps over a lazy dog while seventeen other " +
          "animals watch from tall grass near an old stone bridge spanning the " +
          "river whose banks flood each spring when mountain snow melts into " +
          "countless small streams carrying silt toward distant coastal plains " +
          "where farmers plant wheat barley and oats before summer heat arrives",
          "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fx = TextAnalysis.compressionRatio(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Double]("ratio"), r.getAs[Boolean]("keep"))).toMap
    assert(fx(1L)._1 > 4.0 && !fx(1L)._2, s"sub-token repetition must over-compress: ${fx(1L)}")
    assert(fx(2L)._1 < 1.5 && !fx(2L)._2, s"high-entropy noise must under-compress: ${fx(2L)}")
    assert(fx(3L)._2, s"repeated prose sits inside the bracket: ${fx(3L)}")
  }

  test("winnowFingerprint: every window is covered, shared runs share a fingerprint, ties go rightmost") {
    val s = spark
    import s.implicits._
    val k = 5; val w = 4
    // corpus-wide winnowing guarantee: every full window of w consecutive
    // gram positions contains at least one selected position
    val sel = TextAnalysis.winnowFingerprint(spark, sf0001, k, w).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("pos")).toSet }
    val lens = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n")).toMap
    assert(sel.nonEmpty)
    sel.foreach { case (id, ps) =>
      val nGrams = lens(id) - k + 1
      (1 to nGrams - w + 1).foreach { a =>
        assert((a until a + w).exists(p => ps.contains(p.toLong)),
          s"doc $id: window [$a, ${a + w - 1}] selected nothing")
      }
      // density: selections can't exceed one per window-start plus the tail
      assert(ps.size <= nGrams, s"doc $id over-selected")
    }
    // two docs sharing a run of w+k-1 = 8 tokens share >= 1 fingerprint HASH
    val shared = (1 to 8).map(i => s"common$i").mkString(" ")
    val dir = tempDir("winnow")
    Seq((1L, s"${(1 to 10).map(i => s"a$i").mkString(" ")} $shared", "en", "s", 1L),
        (2L, s"$shared ${(1 to 10).map(i => s"b$i").mkString(" ")}", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = TextAnalysis.winnowFingerprint(spark, dir, k, w).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rs) => id -> rs.map(_.getAs[Long]("fp_hash")).toSet }
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "the SWA guarantee: a shared 8-token run must share a selected gram")
    // rightmost tie-break: a constant doc's identical hashes select the
    // window's RIGHT edge each time — picks advance with the window
    val cdir = tempDir("winnow-const")
    Seq((1L, Seq.fill(12)("same").mkString(" "), "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$cdir/documents.parquet")
    val cp = TextAnalysis.winnowFingerprint(spark, cdir, k, w).collect()
      .map(_.getAs[Long]("pos")).sorted.toSeq
    // 8 gram positions, full windows end at 4..8: rightmost min of window
    // ending at e IS e, so picks are exactly 4..8
    assert(cp === (4L to 8L), s"rightmost ties must select window ends: $cp")
  }

  test("tokenEntropy: closed-form fixtures pin the entropy law; corpus rows match a local replay") {
    val s = spark
    import s.implicits._
    val dir = tempDir("entropy")
    Seq(
      (1L, "solo", "en", "src0", 4L),                                  // 1 token
      (2L, Seq.fill(30)("spam").mkString(" "), "en", "src0", 149L),    // 30x one token
      (3L, (1 to 16).map(i => s"w$i").mkString(" "), "en", "src0", 60L), // all distinct
      (4L, Seq.fill(5)("a b c d").mkString(" "), "en", "src0", 39L)    // 4 tokens x5, uniform
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextAnalysis.tokenEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Double]("entropy"), r.getAs[Double]("norm_entropy"))).toMap
    assert(m(1L) === ((1L, 1L, 0.0, 0.0)), "single token: zero entropy, zero norm")
    assert(m(2L) === ((30L, 1L, 0.0, 0.0)), "pure repetition: zero entropy")
    assert(m(3L)._3 === BigDecimal(math.log(16)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m(3L)._4 === 1.0, "all-distinct uniform: norm entropy exactly 1")
    assert(m(4L)._3 === BigDecimal(math.log(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      "uniform over 4 tokens: ln 4 regardless of length")
    assert(m(4L)._4 === 1.0)
    // corpus: exact local replay of the two-level count + entropy form
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
    val got = TextAnalysis.tokenEntropy(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    docs.foreach { r =>
      val counts = r.getAs[String]("text").split(" ", -1)
        .groupBy(identity).map(_._2.length)
      val n = counts.sum.toDouble
      val raw = math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
      val exp = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(r.getAs[Long]("doc_id")) - exp) <= 1e-6,
        s"doc ${r.getAs[Long]("doc_id")}: ${got(r.getAs[Long]("doc_id"))} vs $exp")
    }
  }

  test("labelPrototypes: one row per (label, component), mean verified independently") {
    val emb = Tables.embeddings(spark, sf0001)
    val labels = emb.select("label").distinct().count()
    val rows = graft.ops.Embeddings.labelPrototypes(spark, sf0001).collect()
    assert(rows.length.toLong === labels * 64)
    // pick one (label, pos) and recompute its mean from raw vectors
    val sample = rows.head
    val (lb, pos) = (sample.getInt(0), sample.getInt(1))
    val want = emb.where(col("label") === lb)
      .select(element_at(col("embedding"), pos).cast("double").as("x"))
      .agg(round(avg("x"), 6)).head().getDouble(0)
    assert(sample.getDouble(2) === want)
    assert(rows.forall(_.getAs[Long]("n_vecs") > 0))
  }

  test("prototypeAssign: confusion counts cover the corpus and match a local replay") {
    val got = graft.ops.Embeddings.prototypeAssign(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    val emb = Tables.embeddings(spark, sf0001)
    assert(got.values.sum === emb.count(), "every vector is assigned exactly once")
    // local replay: round-6 prototypes, cosine argmax with higher-label ties
    val vecs = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val protos = vecs.groupBy(_._2).map { case (lb, vs) =>
      lb -> Array.tabulate(64) { i =>
        val m = vs.map(_._3(i)).sum / vs.length
        java.math.BigDecimal.valueOf(m).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = vecs.map { case (_, lb, v) =>
      val assigned = protos.toSeq.map { case (pl, p) => (cos(v, p), pl) }
        .maxBy { case (c, pl) => (c, pl) }._2
      (lb, assigned)
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    assert(got === want)
  }

  test("embeddingPca matches an independent local covariance + power-iteration replay") {
    def r6(x: Double): Double =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val got = graft.ops.Embeddings.embeddingPca(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("p1"), r.getAs[Double]("p2"))).toMap
    val vecs = Tables.embeddings(spark, sf0001).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    assert(got.size === vecs.length)
    val dim = 64
    val n = vecs.length.toDouble
    val mu = Array.tabulate(dim)(i => r6(vecs.map(_._2(i)).sum / n))
    val cov = Array.tabulate(dim, dim)((i, j) =>
      r6(vecs.map(v => v._2(i) * v._2(j)).sum / n - mu(i) * mu(j)))
    def iterate(c: Array[Array[Double]]): (Array[Double], Double) = {
      var v = Array.fill(dim)(r6(1.0 / math.sqrt(dim.toDouble)))
      for (_ <- 1 to 40) {
        val w = Array.tabulate(dim)(i => (0 until dim).map(j => c(i)(j) * v(j)).sum)
        val nrm = math.sqrt(w.map(x => x * x).sum)
        v = w.map(x => r6(x / nrm))
      }
      val lam = (for (i <- 0 until dim; j <- 0 until dim) yield v(i) * c(i)(j) * v(j)).sum
      (v, r6(lam))
    }
    val (v1, l1) = iterate(cov)
    val cov2 = Array.tabulate(dim, dim)((i, j) => r6(cov(i)(j) - l1 * v1(i) * v1(j)))
    val (v2, _) = iterate(cov2)
    vecs.foreach { case (id, x) =>
      val c = Array.tabulate(dim)(i => x(i) - mu(i))
      val (w1, w2) = (r6((0 until dim).map(i => c(i) * v1(i)).sum),
        r6((0 until dim).map(i => c(i) * v2(i)).sum))
      val (g1, g2) = got(id)
      // both sides round to 6 dp off sums that differ only by order (~1e-13);
      // allow one rounding step for boundary landings
      assert(math.abs(g1 - w1) <= 1e-6 && math.abs(g2 - w2) <= 1e-6,
        s"vec $id: got ($g1, $g2) want ($w1, $w2)")
    }
    // the leading component explains at least as much variance as the second
    def variance(xs: Iterable[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    assert(variance(got.values.map(_._1)) >= variance(got.values.map(_._2)) * 0.99,
      "p1 must carry at least p2's variance")
  }

  test("scd2History: intervals are ordered, one current version per live key, and the current slice IS cdc_apply") {
    val hist = ChangeEvents.scd2History(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("document_key"), r.getAs[Long]("valid_from_id"),
        Option(r.getAs[java.lang.Long]("valid_to_id")).map(_.toLong),
        r.getAs[Boolean]("is_current"), r.getAs[String]("full_document")))
    assert(hist.nonEmpty)
    hist.foreach { case (_, from, to, current, _) =>
      assert(current === to.isEmpty, "is_current means exactly open-ended")
      to.foreach(t => assert(t > from, "versions close strictly after they open"))
    }
    hist.groupBy(_._1).foreach { case (key, vs) =>
      assert(vs.count(_._4) <= 1, s"key $key has multiple current versions")
      // every closed version's bound is a later feed event than its open
      val froms = vs.map(_._2).sorted
      assert(froms.distinct.length === froms.length, s"key $key reuses a version id")
    }
    // the current slice is exactly the applyChanges materialization
    val current = hist.filter(_._4).map(t => (t._1, t._2, t._5)).sortBy(_._1).toSeq
    val applied = ChangeEvents.applyChanges(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("document_key"), r.getAs[Long]("last_event_id"),
        r.getAs[String]("full_document"))).sortBy(_._1).toSeq
    assert(current === applied, "SCD2's open versions must equal the apply-changes state")
  }

  test("scd2Maintain: incremental fold equals the full rebuild at every split, on real data and a planted adversary") {
    val s = spark
    import s.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("document_key"), r.getAs[Long]("valid_from_id"),
        Option(r.getAs[java.lang.Long]("valid_to_id")).map(_.toLong),
        r.getAs[Boolean]("is_current"), r.getAs[String]("full_document")))
      .sortBy(t => (t._1, t._2)).toSeq
    // real feed: split at 25% / 50% / 75% of the id range — incremental
    // must equal the rebuild regardless of where the batch boundary falls
    val ev = ChangeEvents.changeSet(graft.Tables.events(spark, sf0001))
    val full = canon(ChangeEvents.scd2Fold(ev))
    val b = ev.agg(org.apache.spark.sql.functions.min(col("event_id")),
      org.apache.spark.sql.functions.max(col("event_id"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    for (q <- Seq(0.25, 0.5, 0.75)) {
      val split = lo + ((hi - lo) * q).toLong
      val hist = ChangeEvents.scd2Fold(ev.where(col("event_id") <= split))
      val inc = ChangeEvents.scd2Maintain(hist, ev.where(col("event_id") > split))
      assert(canon(inc) === full, s"incremental != rebuild at split q=$q")
    }
    // planted adversary: delete-as-first-batch-op closes the open version
    // without emitting; insert-after-delete reopens; a new key appears only
    // in the batch; an untouched key must ride through bit-for-bit
    val feed = Seq(
      (1L, 10L, "insert", "{a1}"), (1L, 20L, "update", "{a2}"), // untouched key
      (2L, 11L, "insert", "{b1}"),                              // open at split
      (2L, 31L, "delete", "{bx}"), (2L, 35L, "insert", "{b2}"), // close-then-reopen in batch
      (3L, 12L, "insert", "{c1}"),                              // open at split
      (3L, 32L, "update", "{c2}"), (3L, 36L, "update", "{c3}"), // two batch events
      (4L, 33L, "insert", "{d1}")                               // key born in the batch
    ).toDF("document_key", "event_id", "operation_type", "full_document")
    val histP = ChangeEvents.scd2Fold(feed.where(col("event_id") <= 30))
    val incP = ChangeEvents.scd2Maintain(histP, feed.where(col("event_id") > 30))
    assert(canon(incP) === canon(ChangeEvents.scd2Fold(feed)))
    val got = canon(incP)
    assert(got.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)) ===
      Seq((11L, Some(31L), false), (35L, None, true)),
      "delete closes at the delete id without emitting; the later insert reopens")
    assert(got.filter(_._1 == 3L).map(t => (t._2, t._3)) ===
      Seq((12L, Some(32L)), (32L, Some(36L)), (36L, None)))
    // feed-order guard (r16): a REPLAYED batch (ids already folded into
    // history) must throw at execution, never silently close open rows at
    // stale ids — both the valid_from collision and the delete-id case
    // (id 31 appears in history only as a close bound) are violations
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val replayFrom = ChangeEvents.scd2Maintain(
      ChangeEvents.scd2Fold(feed), feed.where(col("event_id") === 32L))
    val eReplay = intercept[Exception] { replayFrom.collect() }
    assert(chain(eReplay).contains("feed-order precondition"),
      s"replayed valid_from id must trip the guard, got: ${chain(eReplay)}")
    val replayClose = ChangeEvents.scd2Maintain(
      ChangeEvents.scd2Fold(feed), feed.where(col("event_id") === 31L))
    val eClose = intercept[Exception] { replayClose.collect() }
    assert(chain(eClose).contains("feed-order precondition"),
      "a replayed delete id (present only as a close bound) must trip the guard")
  }

  test("dailyFill: full calendar grid, zero-filled flows, carry-forward gauges match a local replay") {
    val got = Analytics.dailyFill(spark, sf0001).collect()
      .map(r => (r.getAs[String]("priority"), r.getAs[Long]("day"),
        r.getAs[Long]("n_orders"), r.getAs[Boolean]("observed"),
        Option(r.getAs[java.lang.Double]("day_value")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("value_carry")).map(_.toDouble)))
    // local replay of the daily aggregate
    val raw = Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"), col("o_orderdate").cast("timestamp").cast("long"),
        col("o_totalprice")).collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 86400L), BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val byDay = raw.groupBy(t => (t._1, t._2)).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._3).sum.toDouble) }
    val (d0, d1) = (raw.map(_._2).min, raw.map(_._2).max)
    val prios = raw.map(_._1).distinct.sorted
    assert(got.length === prios.length * (d1 - d0 + 1).toInt, "grid covers every (priority, day)")
    assert(got.exists(!_._4), "the fill path must actually fill at this SF")
    var carry = Map.empty[String, Double]
    got.sortBy(t => (t._1, t._2)).foreach { case (p, day, n, obs, v, vc) =>
      byDay.get((p, day)) match {
        case Some((en, ev)) =>
          assert(obs && n === en, s"($p,$day) count")
          assert(v.exists(x => math.abs(x - ev) < 1e-6), s"($p,$day) value")
          carry += p -> ev
        case None =>
          assert(!obs && n === 0L && v.isEmpty, s"($p,$day) must zero-fill")
          assert(vc === carry.get(p), s"($p,$day) carry: got $vc want ${carry.get(p)}")
      }
    }
  }

  test("q7Volume: cross-border only, broadcast nations, conserved total volume") {
    val q = Analytics.q7Volume(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"nation joins must broadcast:\n$plan")
    val got = q.collect()
    assert(got.nonEmpty, "trade matrix non-vacuous at gate SF")
    got.foreach { r =>
      assert(r.getString(0) !== r.getString(1), "same-nation rows must be excluded")
      assert(Set(1996L, 1997L).contains(r.getLong(2)), "ship_year outside the filter window")
    }
    // conservation: the matrix total equals an independently-computed
    // flat aggregate over the same joined fact rows
    val flat = Tables.lineitem(spark, sf0001)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf0001), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .where(col("s_nationkey") =!= col("c_nationkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double"), count(lit(1)))
      .collect().head
    assert(math.abs(got.map(_.getDouble(3)).sum - flat.getDouble(0)) < 1e-6, "volume conserved")
    assert(got.map(_.getLong(4)).sum === flat.getLong(1), "item count conserved")
  }

  test("q4Priority: plans a semi join and matches a distinct-late-orders replay") {
    val q = Analytics.q4Priority(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$plan")
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.values.sum > 0, "non-vacuous at gate SF")
    // independent replay: inner join + distinct order keys per priority
    val ord = Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
             col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val want = ord.join(Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderpriority", "o_orderkey").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want, "semi-join counts must equal distinct violating orders")
  }

  test("embeddingOutliers matches a local replay; normalized corpus reads mean_norm 1.0") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val got = graft.ops.Embeddings.embeddingOutliers(spark, sf0001).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    val vecs = Tables.embeddings(spark, sf0001)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val byLabel = vecs.groupBy(_._1)
    assert(got.keySet === byLabel.keySet)
    for ((label, vs) <- byLabel) {
      val scalars = vs.map { case (_, v) =>
        var ss = 0.0; var mx = 0.0
        v.foreach { f => val d = f.toDouble; ss += d * d; if (math.abs(d) > mx) mx = math.abs(d) }
        (r6(math.sqrt(ss)), r6(mx))
      }
      val n = scalars.length
      // exact decimal sums, then the same rounded double chain
      val sn = scalars.map(s => BigDecimal(s._1).setScale(6)).sum
      val sp = scalars.map(s => BigDecimal(s._2).setScale(6)).sum
      val ssp = scalars.map(s => (BigDecimal(s._2).setScale(6) * BigDecimal(s._2).setScale(6))).sum
      val meanNorm = r6(sn.toDouble / n)
      val meanPeak = r6(sp.toDouble / n)
      val stdPeak = r6(math.sqrt((ssp.toDouble - sp.toDouble * sp.toDouble / n) / (n - 1)))
      val outliers = scalars.count(s => math.abs(s._2 - meanPeak) > 2.0 * stdPeak).toLong
      val (gn, gmn, gmp, gsp, go) = got(label)
      assert(gn === n.toLong, s"label $label n")
      assert(gmn === meanNorm, s"label $label mean_norm")
      assert(gmn === 1.0, s"label $label: unit-normalized corpus must read 1.0")
      assert(gmp === meanPeak, s"label $label mean_peak")
      assert(gsp === stdPeak, s"label $label std_peak")
      assert(go === outliers, s"label $label outliers")
    }
    assert(got.values.map(_._5).sum > 0, "peak outliers non-vacuous at gate SF")
  }

  test("embeddingOutliers publishes null std and 0 outliers for a singleton label") {
    // sample std needs n ≥ 2; before the guard a one-vector label produced
    // NaN (n−1 = 0 denominator) with engine-divergent NULL/NaN handling
    val dir = tempDir("emb_singleton")
    val s = spark
    import s.implicits._
    Seq(
      (1L, Array(0.6f, 0.8f), 0),
      (2L, Array(0.8f, 0.6f), 0),
      (3L, Array(1.0f, 0.0f), 1)) // label 1 has exactly one vector
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.ops.Embeddings.embeddingOutliers(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got(1).isNullAt(got(1).fieldIndex("std_peak")), "singleton std must be NULL")
    assert(got(1).getAs[Long]("n_outliers") === 0L, "singleton label has no outliers")
    assert(!got(0).isNullAt(got(0).fieldIndex("std_peak")), "n=2 label keeps its std")
  }

  test("q8Share: shares in [0,1] and the conditional numerator decomposes the total") {
    val got = Analytics.q8Share(spark, sf0001).collect()
    assert(got.nonEmpty, "market non-vacuous at gate SF")
    // independent recompute: the same pipeline WITHOUT the conditional,
    // broken out by supplier nation — the share must equal the named
    // nation's slice over the year total, and slices must sum to 1
    val byNation = Tables.lineitem(spark, sf0001)
      .withColumn("vol", col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
      .join(Tables.part(spark, sf0001).where(col("p_type") === "ECONOMY")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sf0001)
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
               col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate").cast("timestamp")).cast("long").as("y")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf0001), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf0001).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(spark, sf0001).withColumnRenamed("s_nationkey", "sn_key"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("y"), col("sn_key"))
      .agg(sum(col("vol")).cast("double").as("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (r <- got) {
      val yr = r.getAs[Long]("order_year")
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range")
      val total = byNation.collect { case ((y, _), v) if y == yr => v }.sum
      val slice = byNation.getOrElse((yr, 3), 0.0) // NATION_3 = nationkey 3
      assert(math.abs(r.getAs[Double]("total_volume") - total) < 1e-6, s"year $yr total")
      assert(math.abs(share - math.rint(slice / total * 1e6) / 1e6) < 1e-6, s"year $yr share")
    }
  }

  test("q10Returns: top-k plans as TakeOrdered (bounded heap) and matches an unlimited replay") {
    val q = Analytics.q10Returns(spark, sf0001, k = 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"orderBy().limit(k) must plan a bounded per-partition heap, not a global sort:\n$plan")
    val got = q.collect().map(r => (r.getAs[Long]("c_custkey"), r.getAs[Double]("revenue")))
    assert(got.length === 20)
    // replay: same aggregate without the limit, cut locally with the same tie-break
    val all = Analytics.q10Returns(spark, sf0001, k = Int.MaxValue).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Double]("revenue")))
    val want = all.sortBy { case (ck, rev) => (-rev, ck) }.take(20)
    assert(got.toSeq === want.toSeq, "top-20 cut must match the full ordering")
  }

  test("q13OrdersDist: zero bucket present and the histogram accounts every customer exactly once") {
    val got = Analytics.q13OrdersDist(spark, sf0001).collect()
      .map(r => r.getAs[Long]("n_orders") -> r.getAs[Long]("n_custs")).toMap
    assert(got.contains(0L),
      "customers with no orders in the window must survive the outer join")
    val nCust = Tables.customer(spark, sf0001).count()
    assert(got.values.sum === nCust, "histogram partitions the customer population")
    // independent replay from the raw orders
    val cnt = Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val custs = Tables.customer(spark, sf0001).select("c_custkey").collect().map(_.getLong(0))
    val want = custs.map(c => cnt.getOrElse(c, 0L))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got === want, "distribution must match the per-customer replay")
  }

  test("q14Promo: promo share matches the two-slice decomposition") {
    val r = Analytics.q14Promo(spark, sf0001).collect().head
    val share = r.getAs[Double]("promo_share")
    assert(share > 0.0 && share < 100.0, "non-vacuous, non-degenerate at gate SF")
    def slice(promoOnly: Boolean): Double = {
      val li = Tables.lineitem(spark, sf0001)
        .where(col("l_shipdate") >= lit("2000-09-01").cast("timestamp") &&
               col("l_shipdate") < lit("2000-10-01").cast("timestamp"))
        .join(Tables.part(spark, sf0001).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
      val f = if (promoOnly) li.where(col("p_type") === "PROMO") else li
      f.agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double")).collect().head.getDouble(0)
    }
    val (promo, total) = (slice(promoOnly = true), slice(promoOnly = false))
    assert(math.abs(r.getAs[Double]("total_revenue") - total) < 1e-6)
    assert(math.abs(share - math.rint(100.0 * promo / total * 1e6) / 1e6) < 1e-6)
  }

  test("q18BigOrders: every row clears the quantity bar and the cut matches a replay") {
    val got = Analytics.q18BigOrders(spark, sf0001).collect()
    assert(got.nonEmpty, "big orders exist at gate SF")
    got.foreach(r => assert(r.getAs[Double]("sum_qty") > 150.0, "HAVING bar"))
    // replay: per-order quantity sums from raw lineitem, same cut
    val sums = Tables.lineitem(spark, sf0001)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prices = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = sums.filter(_._2 > 150.0).keys.toSeq
      .sortBy(ok => (-prices(ok), ok)).take(100)
    assert(got.map(_.getAs[Long]("o_orderkey")).toSeq === want,
      "survivor set and ordering must match the replay")
  }

  test("q12Latency: buckets partition every joined item and match a local datediff replay") {
    val got = Analytics.q12Latency(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    got.values.foreach { case (d30, d60, d90, dp, n) =>
      assert(d30 + d60 + d90 + dp === n, "buckets must partition the items")
    }
    // local replay over UTC epoch seconds: both date columns are midnight
    // UTC stamps (driver testdata), so the calendar-day difference both
    // engines' datediff computes equals the floored epoch-day difference
    val ordMap = Tables.orders(spark, sf0001)
      .selectExpr("o_orderkey", "o_orderpriority",
        "cast(cast(o_orderdate as timestamp) as long) as os").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val lats = Tables.lineitem(spark, sf0001)
      .selectExpr("l_orderkey", "cast(cast(l_shipdate as timestamp) as long) as ss").collect()
      .map { r =>
        val (prio, os) = ordMap(r.getLong(0))
        prio -> (Math.floorDiv(r.getLong(1), 86400L) - Math.floorDiv(os, 86400L))
      }
    val want = lats.groupBy(_._1).view.mapValues { xs =>
      val ls = xs.map(_._2)
      (ls.count(_ <= 30).toLong, ls.count(l => l > 30 && l <= 60).toLong,
        ls.count(l => l > 60 && l <= 90).toLong, ls.count(_ > 90).toLong, ls.length.toLong)
    }.toMap
    assert(got === want)
  }

  test("q15TopSupplier: decimal-exact max cut keeps ties and matches a replay") {
    val got = Analytics.q15TopSupplier(spark, sf0001).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Double]("total_revenue"))
    assert(got.nonEmpty, "the quarter has revenue at gate SF")
    // replay from the per-supplier aggregate without the cut
    val rev = Tables.lineitem(spark, sf0001)
      .where(col("l_shipdate") >= lit("2000-07-01").cast("timestamp") &&
             col("l_shipdate") < lit("2000-10-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .as("rev"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1))
    val mx = rev.map(_._2).max
    val want = rev.filter(_._2 == mx).map(_._1).sorted
    assert(got.map(_._1).toSeq === want.toSeq, "exactly the max-revenue suppliers, ties kept")
    got.foreach { case (_, r) => assert(math.abs(r - mx.doubleValue) < 1e-6) }
  }

  test("q19Disjunct: OR-of-conjunctions matches a local branch replay and part pre-filters below the join") {
    val r = Analytics.q19Disjunct(spark, sf0001).collect().head
    val parts = Tables.part(spark, sf0001)
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap
    def hit(pk: Long, qty: Double): Boolean = parts.get(pk).exists { case (b, s) =>
      (b == "Brand#1" && s >= 1 && s <= 15 && qty >= 1 && qty <= 20) ||
      (b == "Brand#2" && s >= 10 && s <= 30 && qty >= 10 && qty <= 30) ||
      (b == "Brand#3" && s >= 20 && s <= 50 && qty >= 20 && qty <= 40)
    }
    val li = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").collect()
      .filter(x => hit(x.getLong(0), x.getDouble(1)))
    val wantRev = li.map { x =>
      val p = BigDecimal(x.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val d = BigDecimal(x.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      p * (BigDecimal(1).setScale(2) - d)
    }.sum
    assert(r.getAs[Long]("n_items") === li.length.toLong)
    assert(math.abs(r.getAs[Double]("revenue") - wantRev.toDouble) < 1e-6)
    assert(li.nonEmpty, "disjunction non-vacuous at gate SF")
    // the part-only disjunction must evaluate BELOW the join: a Filter
    // mentioning p_brand sits on the part side, not only above the join
    val plan = Analytics.q19Disjunct(spark, sf0001).queryExecution.optimizedPlan
    val joinNode = plan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
    val partSideFiltered = joinNode.children.exists(_.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).exists(_ == "p_brand") => f
    }.nonEmpty)
    assert(partSideFiltered,
      s"part-only disjunction must pre-filter the part scan below the join:\n$plan")
  }

  test("q17SmallQty: per-part threshold is exact-decimal and matches a local replay") {
    val r = Analytics.q17SmallQty(spark, sf0001).collect().head
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val brandParts = Tables.part(spark, sf0001)
      .where(col("p_brand") === "Brand#5").select("p_partkey").collect()
      .map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(x => (x.getLong(0), d2(x.getDouble(1)), d2(x.getDouble(2))))
      .filter(x => brandParts(x._1))
    val stats = li.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.length)).toMap
    val small = li.filter { case (pk, q, _) =>
      val (sq, cq) = stats(pk); q * 2 * cq < sq
    }
    assert(small.nonEmpty, "small-quantity rows exist at gate SF")
    assert(r.getAs[Long]("n_items") === small.length.toLong)
    assert(math.abs(r.getAs[Double]("small_qty_revenue") - small.map(_._3).sum.toDouble) < 1e-6)
  }

  test("q9Margin: exact two-term sums and the IEEE margin chain match a local replay") {
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def sparkRound6(d: Double): Double =
      java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val got = Analytics.q9Margin(spark, sf0001).collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        (x.getDouble(2), x.getDouble(3), x.getLong(4))).toMap
    assert(got.nonEmpty, "name pattern non-vacuous at gate SF")
    val pt = Tables.part(spark, sf0001)
      .where(col("p_name").like("%widget%")).select("p_partkey", "p_retailprice")
      .collect().map(x => x.getLong(0) -> d2(x.getDouble(1))).toMap
    val ord = Tables.orders(spark, sf0001)
      .selectExpr("o_orderkey", "cast(year(cast(o_orderdate as timestamp)) as long) as y")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val sn = {
      val nat = Tables.nation(spark, sf0001).select("n_nationkey", "n_name").collect()
        .map(x => x.getInt(0) -> x.getString(1)).toMap
      Tables.supplier(spark, sf0001).select("s_suppkey", "s_nationkey").collect()
        .map(x => x.getLong(0) -> nat(x.getInt(1))).toMap
    }
    val rows = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_orderkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity").collect()
      .flatMap { x =>
        pt.get(x.getLong(0)).map { retail =>
          val key = (sn(x.getLong(2)), ord(x.getLong(1)))
          val gross = d2(x.getDouble(3)) * (BigDecimal(1).setScale(2) - d2(x.getDouble(4)))
          key -> (gross, retail * d2(x.getDouble(5)))
        }
      }
    val want = rows.groupBy(_._1).view.mapValues { xs =>
      val g = xs.map(_._2._1).sum.toDouble
      val c = xs.map(_._2._2).sum.toDouble
      (g, sparkRound6(g - 0.1 * c), xs.length.toLong)
    }.toMap
    assert(got.keySet === want.keySet)
    for ((k, (g, m, n)) <- want) {
      assert(math.abs(got(k)._1 - g) < 1e-6, s"$k gross")
      assert(math.abs(got(k)._2 - m) < 1e-9, s"$k margin")
      assert(got(k)._3 === n, s"$k n_items")
    }
  }

  test("q22Dormant: anti-join of above-average balances, boundary-exact on both engines' side") {
    val q = Analytics.q22Dormant(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"dormancy must plan as an anti join:\n$plan")
    val got = q.collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.nonEmpty, "dormant high-balance customers exist at gate SF")
    // local replay with exact decimal threshold arithmetic
    val cust = Tables.customer(spark, sf0001)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val pos = cust.filter(_._3 > 0)
    val (balSum, balN) = (pos.map(_._3).sum, pos.length)
    val active = Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val nations = Tables.nation(spark, sf0001).select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = cust
      .filter { case (ck, _, bal) => bal * balN > balSum && !active(ck) }
      .groupBy(c => nations(c._2)).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._3).sum.toDouble)).toMap
    assert(got.keySet === want.keySet)
    for ((n, (cnt, bal)) <- want) {
      assert(got(n)._1 === cnt, s"nation $n count")
      assert(math.abs(got(n)._2 - bal) < 1e-6, s"nation $n balance")
    }
  }

  test("dailyTypeMatrix: explicit-values pivot plans one scan and matches a long-form replay") {
    val q = Analytics.dailyTypeMatrix(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).length === 1,
      s"explicit-values pivot must not add a distinct-discovery scan:\n$plan")
    val got = q.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.nonEmpty)
    val long = Tables.events(spark, sf0001)
      .selectExpr("cast(cast(ts as timestamp) as long) div 86400 as day", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet === long.keySet)
    for ((day, evs) <- long) {
      val w = got(day)
      val c = Seq("click", "error", "purchase", "signup", "view")
        .map(t => evs.count(_ == t).toLong)
      assert(Seq(w._1, w._2, w._3, w._4, w._5) === c, s"day $day pivot cells")
      assert(w._6 === c.sum, s"day $day row total consistent with its cells")
    }
  }

  test("q2MinCost: IEEE unit-cost quotient keeps min ties, plans TakeOrdered, matches a replay") {
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val q = Analytics.q2MinCost(spark, sf0001)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-k must plan a bounded heap, not a global sort")
    val got = q.collect().map(r =>
      (r.getDouble(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    assert(got.nonEmpty, "slice non-vacuous at gate SF")
    val sliceParts = Tables.part(spark, sf0001)
      .where(col("p_type") === "ECONOMY" && col("p_size") <= 10)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    // per (part, supp): IEEE quotient of exact decimal sums — the same
    // double both engines derive, so min/equality replay bit-exactly
    val costs = Tables.lineitem(spark, sf0001)
      .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), d2(r.getDouble(2)), d2(r.getDouble(3))))
      .filter(r => sliceParts(r._1))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(xs => xs.map(_._3).sum.toDouble / xs.map(_._4).sum.toDouble).toMap
    val minCost = costs.groupBy(_._1._1).view.mapValues(_.values.min).toMap
    val nat = Tables.nation(spark, sf0001).select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val supp = Tables.supplier(spark, sf0001)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal").collect()
      .map(r => r.getLong(0) -> (r.getString(1), nat(r.getInt(2)), r.getDouble(3))).toMap
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val want = costs.collect { case ((pk, sk), c) if c == minCost(pk) =>
      val (sn, nn, bal) = supp(sk); (bal, sn, nn, pk, r6(c))
    }.toSeq.sortBy(t => (-t._1, t._2, t._4)).take(100)
    assert(got.toSeq === want, "min-cost join-back must keep exactly the per-part minima")
  }

  test("q11Important: scale-invariant mean-relative threshold matches an exact-decimal replay") {
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val got = Analytics.q11Important(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty, "above-threshold parts exist at gate SF")
    val retail = Tables.part(spark, sf0001).select("p_partkey", "p_retailprice")
      .collect().map(r => r.getLong(0) -> d2(r.getDouble(1))).toMap
    val values = Tables.lineitem(spark, sf0001).select("l_partkey", "l_quantity").collect()
      .map(r => (r.getLong(0), d2(r.getDouble(1))))
      .groupBy(_._1).view
      .mapValues(xs => xs.map { case (pk, q) => q * retail(pk) }.sum).toMap
    val total = values.values.sum
    val n = values.size
    val want = values.toSeq
      .filter { case (_, v) => v * n * 10 > total * 13 }
      .map { case (pk, v) => (pk, v.toDouble) }
      .sortBy(t => (-t._2, t._1))
    assert(got.toSeq === want, "threshold survivors and order must replay exactly")
  }

  test("q16Variety: distinct-supplier grid matches a replay and excludes the brand") {
    val got = Analytics.q16Variety(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got.nonEmpty, "attribute grid non-vacuous at gate SF")
    assert(!got.keySet.exists(_._1 == "Brand#1"), "excluded brand must not appear")
    val attrs = Tables.part(spark, sf0001)
      .where(col("p_brand") =!= "Brand#1")
      .select("p_partkey", "p_brand", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3))).toMap
    val want = Tables.lineitem(spark, sf0001).select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (pk, sk) => attrs.get(pk).map(a => (a, sk)) }
      .distinct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(got === want, "per-cell distinct supplier counts must replay")
  }

  test("q20Excess: conditional-sum surge test matches an exact-decimal replay") {
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val got = Analytics.q20Excess(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3))).toMap
    assert(got.nonEmpty, "surging suppliers exist at gate SF")
    val widget = Tables.part(spark, sf0001)
      .where(col("p_name").like("%widget%")).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val y0 = java.time.LocalDate.parse("2000-01-01").toEpochDay
    val y1 = java.time.LocalDate.parse("2001-01-01").toEpochDay
    val pairs = Tables.lineitem(spark, sf0001)
      .selectExpr("l_partkey", "l_suppkey", "l_quantity",
        "cast(l_shipdate as timestamp) as sd").collect()
      .map(r => (r.getLong(0), r.getLong(1), d2(r.getDouble(2)),
        r.getTimestamp(3).toInstant.getEpochSecond / 86400))
      .filter(r => widget(r._1))
      .groupBy(r => (r._2, r._1)).view
      .mapValues { xs =>
        val qy = xs.filter(x => x._4 >= y0 && x._4 < y1).map(_._3).sum
        (qy, xs.map(_._3).sum)
      }.toMap
    val want = pairs.collect { case ((sk, _), (qy, qt)) if qy * 2 > qt => sk }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.keySet === want.keySet, "qualifying supplier set must replay")
    for ((sk, n) <- want) assert(got(sk)._3 === n, s"supplier $sk surging-part count")
    // every row qualifies: at least one part shipped most of its volume in-year
    assert(got.values.forall(_._3 >= 1L))
  }

  test("q21Waiting: sole-late-supplier charge matches a replay; no lineitem self-join planned") {
    val q = Analytics.q21Waiting(spark, sf0001)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "top-k must plan a bounded heap")
    val got = q.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty, "sole-late suppliers exist at gate SF")
    val ord = Tables.orders(spark, sf0001).where(col("o_orderstatus") === "F")
      .selectExpr("o_orderkey", "cast(o_orderdate as timestamp) as od").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toInstant.getEpochSecond).toMap
    val perSupp = Tables.lineitem(spark, sf0001)
      .selectExpr("l_orderkey", "l_suppkey", "cast(l_shipdate as timestamp) as sd").collect()
      .flatMap { r =>
        ord.get(r.getLong(0)).map { od =>
          ((r.getLong(0), r.getLong(1)),
            if (r.getTimestamp(2).toInstant.getEpochSecond > od + 60L * 86400) 1 else 0)
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val byOrder = perSupp.groupBy(_._1._1)
    val waits = byOrder.collect {
      case (_, supps) if supps.size > 1 && supps.values.sum == 1 =>
        supps.find(_._2 == 1).get._1._2
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val names = Tables.supplier(spark, sf0001).select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = waits.toSeq.map { case (sk, n) => (sk, names(sk), n) }
      .sortBy(t => (-t._3, t._1)).take(100)
    assert(got.toSeq === want, "numwait ranking must replay exactly")
  }
}
