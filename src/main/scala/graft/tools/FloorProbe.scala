package graft.tools

import graft.BenchHarness
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the per-query job floor the bench pays on every sub-second
  * family (r15, VERDICT r14 #8): ~107 of the 151 registered queries finish
  * under a second at sf0.1 and their summed wall is dominated by per-query
  * session fixed costs, not engine work — this probe measures WHAT those
  * fixed costs are, under the exact bench session recipe, so ratio drift
  * on millisecond anchors stops being re-litigated from intuition.
  *
  * Stages measured (min over reps, bench protocol — dropCaches + gc before
  * each sample):
  *   plan_only        analyze+optimize+physical-plan a scan+groupBy, no job
  *   job_1task        spark.range(1) noop write — irreducible job launch
  *   job_32task       one 32-partition stage, trivial rows — task dispatch
  *   scan_noop        sf parquet scan → noop, no shuffle
  *   scan_groupby     scan → 32-partition shuffle → tiny agg (the floor
  *                    shape of most sub-second families)
  *   scan_groupby_noaqe  same with AQE off (isolates AQE's re-plan cost)
  *   scan_groupby_p8  same with shuffle.partitions=8 (task-count term)
  *
  * Usage: runMain graft.tools.FloorProbe [sfDir] [reps]
  * Prints one JSON line {"floor_probe":{...}} — numbers recorded in
  * SURVEY §6's floor note.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = BenchHarness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    BenchHarness.warmup(spark, sfDir)

    def sample(body: => Unit): Double = {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        BenchHarness.dropCaches(spark)
        System.gc()
        val t0 = System.nanoTime()
        body
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def groupbyDf(s: SparkSession) = s.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    out("plan_only") = sample {
      // force full analysis+optimization+physical planning, no execution;
      // a fresh plan each sample (the lit defeats plan-cache hits)
      groupbyDf(spark).where(lit(System.nanoTime()) > 0).queryExecution.executedPlan
      ()
    }
    out("job_1task") = sample(noop(spark.range(1).toDF()))
    out("job_32task") = sample(noop(spark.range(0, 32, 1, 32).toDF()))
    out("scan_noop") = sample(noop(spark.read.parquet(s"$sfDir/documents.parquet")))
    out("scan_groupby") = sample(noop(groupbyDf(spark)))
    out("scan_groupby_noaqe") = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t = sample(noop(groupbyDf(spark)))
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      t
    }
    out("scan_groupby_p8") = {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val t = sample(noop(groupbyDf(spark)))
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      t
    }
    val q = out.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString(",")
    println(s"""{"floor_probe":{$q},"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
