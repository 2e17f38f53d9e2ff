package graft.tools

import graft.{BenchHarness, SparkEntry}

/** Single-query benchmark/plan tool for iterating on one operator:
  *
  *   runMain graft.tools.QueryBench <query> [sfDir] [reps] [explain]
  *
  * Session shape, warmup, and per-sample cache drops come from
  * [[graft.BenchHarness]] — the SAME recipe graft.Bench uses, so timings
  * here are directly comparable to BENCH_r{N}.json entries.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryBench <query> [sfDir] [reps] [explain]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.length > 3 && args(3) == "explain"
    val spark = BenchHarness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    BenchHarness.warmup(spark, sfDir)
    // The probe-only entry answers from an index a prior build wrote; in
    // graft.Bench that's the same pass's ann_ivf_build (name order). A
    // fresh QueryBench JVM has no index yet — build one, untimed.
    if (name == "ann_ivf_probe")
      SparkEntry.benchExtras("ann_ivf_build")(spark, sfDir).count()
    for (i <- 1 to reps) {
      BenchHarness.dropCaches(spark)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries.getOrElse(name,
        SparkEntry.benchExtras(name))(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[qbench] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (explain && i == reps) println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
