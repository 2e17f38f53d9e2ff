package graft

import graft.ops.Contracts

/** D23 — declarative data-quality contracts: planted violations must
  * surface in exactly the right check rows, a clean corpus passes all.
  */
class ContractsSpec extends SparkSpec {

  private def plant(dir: String): Unit = {
    val s = spark
    import s.implicits._
    // doc 3 duplicates id 2; doc 4's n_chars lies; doc 5 has an empty lang
    Seq(
      (1L, "alpha beta", "en", "a", 10L),
      (2L, "gamma delta", "en", "a", 11L),
      (2L, "epsilon zeta", "en", "b", 12L),
      (4L, "eta theta", "en", "b", 999L),
      (5L, "iota kappa", "", "b", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((1L, 10L), (2L, 20L), (3L, 77L)) // custkey 77 does not exist
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(10L), Tuple1(20L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  test("planted violations land in exactly the right checks") {
    val dir = tempDir("dq")
    plant(dir)
    val got = Contracts.dqChecks(spark, dir).collect()
      .map(r => r.getAs[String]("check") ->
        (r.getAs[Double]("metric"), r.getAs[Boolean]("pass"))).toMap
    assert(got("doc_row_count") === ((5.0, true)))
    assert(got("doc_id_unique_ratio") === ((0.8, false)), "4 distinct ids of 5 rows")
    assert(got("doc_text_null_count") === ((0.0, true)))
    assert(got("doc_nchars_mismatch_count") === ((1.0, false)))
    assert(got("doc_lang_missing_count") === ((1.0, false)))
    assert(got("doc_min_chars")._2, "all n_chars positive")
    assert(got("orders_custkey_orphans") === ((1.0, false)), "custkey 77 is an orphan")
  }

  test("the driver corpus passes its own contract, and the pass is one scan + one anti-join") {
    val rows = Contracts.dqChecks(spark, sf0001).collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getAs[Boolean]("pass")),
      s"unexpected violations: ${rows.filterNot(_.getAs[Boolean]("pass")).mkString(", ")}")
    // the scalar checks must share ONE aggregation over documents: exactly
    // one documents scan in the plan (the FK branch scans orders/customer)
    val plan = Contracts.dqChecks(spark, sf0001).queryExecution.executedPlan.toString
    val docScans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    assert(docScans === 1, s"scalar checks must batch into one documents scan:\n$plan")
  }
}
