package graft

import graft.ops.Maintenance

/** D11 — small-file compaction: the rewrite must preserve every row while
  * collapsing per-epoch file sprawl to the size-targeted count.
  */
class MaintenanceSpec extends SparkSpec {

  test("compaction preserves rows and collapses per-epoch small files") {
    val s = spark
    import s.implicits._
    val in = tempDir("compact-in")
    val out = tempDir("compact-out") + "/data"
    // 20 epochs of tiny files, as a long-running stream would leave behind
    (0 until 20).foreach { epoch =>
      (epoch * 10 until (epoch + 1) * 10).map(i => (i.toLong, s"row$i"))
        .toDF("id", "payload")
        .coalesce(1)
        .write.mode("append").parquet(in)
    }
    val (_, before) = Maintenance.fileCensus(spark, in)
    assert(before >= 20, s"expected >= 20 small files, found $before")
    val (rows, _, after) = Maintenance.compact(spark, in, out)
    assert(rows === 200)
    assert(after === 1, s"200 tiny rows must compact to one file, got $after")
    assert(spark.read.parquet(out).select("id").distinct().count() === 200)
  }
}
