package graft

import graft.ops.{TokenIndex, Versioned}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D27 — maintained inverted token index over a Versioned corpus. */
class TokenIndexSpec extends SparkSpec {

  private def docs(from: Int, n: Int, words: String*): DataFrame = {
    val s = spark
    import s.implicits._
    (from until from + n).map { i =>
      (i.toLong, (words :+ s"uniq$i").mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def postingsOf(df: DataFrame) =
    df.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def indexRows(dir: String) =
    Versioned.read(spark, dir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("doc_id"), r.getAs[Long]("tf"))).toSet

  test("build + lookup answer exact posting lists; appends refresh incrementally") {
    val corpus = tempDir("tixcorpus")
    val index = tempDir("tixindex")
    Versioned.commit(spark, docs(0, 6, "alpha", "beta", "alpha"), corpus)
    assert(TokenIndex.build(spark, corpus, index) === 1L)
    assert(indexRows(index) === postingsOf(Versioned.read(spark, corpus)))
    // point lookup: every doc has two 'alpha' and its own uniq token
    val alpha = TokenIndex.lookup(spark, index, "alpha").collect()
    assert(alpha.length === 6 && alpha.forall(_.getAs[Long]("tf") === 2L))
    val uniq = TokenIndex.lookup(spark, index, "uniq3").collect()
    assert(uniq.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tf"))).toSeq === Seq((3L, 1L)))

    // corpus append -> incremental refresh: index version is an APPEND
    Versioned.append(spark, docs(6, 4, "beta", "gamma"), corpus)
    val (cov, incremental) = TokenIndex.refresh(spark, corpus, index)
    assert(cov === 2L && incremental, "append history must take the incremental path")
    val iv = Versioned.versions(spark, index)
    assert(iv === Seq(1L, 2L))
    assert(Versioned.newFiles(spark, index, 1L, 2L).isDefined,
      "the index refresh itself must be a pure append")
    assert(indexRows(index) === postingsOf(Versioned.read(spark, corpus)))
    assert(TokenIndex.lookup(spark, index, "gamma").count() === 4L)

    // replay is a no-op
    val (cov2, noop) = TokenIndex.refresh(spark, corpus, index)
    assert(cov2 === 2L && noop && Versioned.versions(spark, index) === Seq(1L, 2L))

    // a corpus REPLACE forces the full-rebuild fallback and stays exact
    Versioned.commit(spark, docs(100, 3, "delta"), corpus)
    val (cov3, inc3) = TokenIndex.refresh(spark, corpus, index)
    assert(cov3 === 3L && !inc3, "rewritten history must fall back to rebuild")
    assert(indexRows(index) === postingsOf(Versioned.read(spark, corpus)))
    assert(TokenIndex.lookup(spark, index, "alpha").count() === 0L)
  }

  test("token clustering makes lookups file-pruned, not full-index scans") {
    val corpus = tempDir("tixprune")
    val index = tempDir("tixpruneidx")
    // many distinct tokens so the range clustering separates them
    val s = spark
    import s.implicits._
    val rows = (0 until 400).map(i => (i.toLong, f"tok$i%03d common")).toDF("doc_id", "text")
    Versioned.commit(spark, rows, corpus)
    TokenIndex.build(spark, corpus, index, nFiles = 8)
    val v = Versioned.versions(spark, index).last
    val stats = Versioned.fileStats(spark, index, v)
    val total = stats.size
    assert(total >= 4, s"clustering should produce several files, got $total")
    val probe = "tok007"
    val overlapping = stats.values.count(_.get("token") match {
      case Some((_, mn, mx)) => mn.toString <= probe && probe <= mx.toString
      case None => true
    })
    assert(overlapping < total,
      s"point lookup must prune: $overlapping of $total files overlap '$probe'")
    val got = TokenIndex.lookup(spark, index, probe).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(7L))
  }
}
