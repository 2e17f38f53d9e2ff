package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Single-query benchmark/plan tool for iterating on one operator:
  *
  *   runMain graft.tools.QueryBench <query> [sfDir] [reps] [explain]
  *
  * Same session shape as graft.Bench (local[32], AQE on, noop sink) so
  * timings are comparable to BENCH_r{N}.json entries.
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryBench <query> [sfDir] [reps] [explain]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.length > 3 && args(3) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096") // match Bench

      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q6_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    for (i <- 1 to reps) {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[qbench] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (explain && i == reps) println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
