package graft

import graft.sources.TextSources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends SparkSpec {

  private def originalHashes(dir: String): Seq[Seq[Any]] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("text_hash"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("JSONL round trip preserves every document byte-exactly, across preserved shards") {
    val df = TextSources.jsonlRoundtrip(spark, sf0001)
    assert(df.collect().map(_.toSeq).toSeq === originalHashes(sf0001))
    // the write kept multiple shards, so the read back parallelizes
    // file-per-task (the splittability rule the object doc states)
    val nFiles = new java.io.File(TextSources.roundtripDir(sf0001, "jsonl"))
      .listFiles().count(f => f.getName.endsWith(".json") && f.length() > 0)
    assert(nFiles >= 2, s"interchange dump collapsed to $nFiles file(s)")
  }

  test("CSV round trip preserves every document byte-exactly") {
    val got = TextSources.csvRoundtrip(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(got === originalHashes(sf0001))
  }

  test("CSV quoting survives adversarial content: commas, quotes, leading spaces") {
    val s = spark
    import s.implicits._
    val dir = tempDir("csvadv")
    val rows = Seq(
      (1L, """plain words"""),
      (2L, """comma, separated, content"""),
      (3L, """says "quoted" things"""),
      (4L, """  leading and trailing  """),
      (5L, """mixed, "both", styles""")
    ).map { case (id, t) => (id, t, "en", "adv", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextSources.csvRoundtrip(spark, dir).collect().map(_.toSeq).toSeq
    val want = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("text_hash"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("JSONL escaping survives newlines, tabs, backslashes, and unicode") {
    val s = spark
    import s.implicits._
    val dir = tempDir("jsonladv")
    val rows = Seq(
      (1L, "line one\nline two"),
      (2L, "tab\tand backslash \\ and quote \""),
      (3L, "ünïcode 汉字 emoji 😀")
    ).map { case (id, t) => (id, t, "xx", "adv", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextSources.jsonlRoundtrip(spark, dir).collect().map(_.toSeq).toSeq
    val want = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("text_hash"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("FAILFAST surfaces a malformed JSONL line instead of nulling it") {
    val dir = tempDir("jsonlbad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-00000.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |{not json at all""".stripMargin)
    val read = spark.read.schema(TextSources.docSchema)
      .option("mode", "FAILFAST").json(dir)
    val e = intercept[org.apache.spark.SparkException] { read.collect() }
    assert(e.getMessage.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.toLowerCase.contains("malformed")),
      s"expected a malformed-record failure, got: ${e.getMessage}")
  }
}
