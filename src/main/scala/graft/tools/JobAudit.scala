package graft.tools

import graft.{BenchHarness, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch diagnostics: run one registered query and print every Spark job
  * it launches (id, #stages, duration, first stage name) — the tool for
  * hunting fixed per-job overhead in multi-action operators.
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: JobAudit <query> [sfDir]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = BenchHarness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    BenchHarness.warmup(spark, sfDir)
    // one warm pass so JIT/codegen don't masquerade as job cost
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    BenchHarness.dropCaches(spark)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (js.time, js.stageInfos.length,
          js.stageInfos.headOption.map(_.name).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, nStages, stage) = starts.getOrDefault(je.jobId, (je.time, -1, "?"))
        lines.add(f"[jobaudit] job ${je.jobId}%3d ${(je.time - t0) / 1000.0}%6.3f s  stages=$nStages%2d  $stage")
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let listener events drain
    lines.forEach(println)
    println(f"[jobaudit] TOTAL $total%.3f s, ${lines.size} jobs")
    spark.stop()
  }
}
