package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Plan inspection for registered queries: prints `explain("formatted")`
  * for each named query (or every registered one with no names) against an
  * SF dir — the iterate-on-the-plan loop's one-command read.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.BenchHarness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name' — keys: ${graft.SparkEntry.queries.keys.toSeq.sorted}"))
      println(s"\n========== $name ==========")
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.logical match {
          // deferred builders: explain the INNER plan the thunk executes
          case graft.plans.DeferredRelation(_, thunk) =>
            thunk().queryExecution.explainString(FormattedMode)
          case _ => df.queryExecution.explainString(FormattedMode)
        }
        println(plan)
      } catch { case e: Throwable =>
        println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
