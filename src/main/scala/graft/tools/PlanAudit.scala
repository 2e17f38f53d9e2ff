package graft.tools

import org.apache.spark.sql.SparkSession
/** Per-round plan audit: dump formatted physical plans for the headline
  * queries (SURVEY.md §6). Run: sbt "runMain graft.tools.PlanAudit" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val defaults = Seq("q1_agg", "q3_join", "q5_join", "q6_agg", "dedup_exact",
      "dedup_minhash_pairs", "ngram_jaccard_lsh", "ann_lsh_topk", "ann_ivf_topk",
      "embedding_near_dup", "ann_brute_topk", "events_sessionize",
      "resume_after", "change_events_json", "contamination", "train_split",
      "repetition_metrics", "boilerplate_frac", "stratified_sample",
      "embedding_quantize")
    val names = if (args.nonEmpty) args.toSeq else defaults
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
