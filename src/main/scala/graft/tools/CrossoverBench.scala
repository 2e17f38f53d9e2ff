package graft.tools

import graft.{BenchHarness, SparkEntry}

/** Time a subset of registered queries on an arbitrary data dir (the
  * crossover corpus from [[CrossoverGen]]) — same session/warmup/cache-drop
  * recipe as graft.Bench, min over reps, one JSON line:
  *
  *   runMain graft.tools.CrossoverBench <dir> <reps> <query> [query...]
  */
object CrossoverBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: CrossoverBench <dir> <reps> <query> [query...]")
    val dir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = BenchHarness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // the shared warmup reads TPC-H tables the crossover dir doesn't have;
    // warm JIT/codegen with an untimed pass of each measured query instead
    for (name <- names) {
      BenchHarness.dropCaches(spark)
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to reps; name <- names) {
      BenchHarness.dropCaches(spark)
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), secs)
    }
    // Locale.ROOT like Bench.fmt: an f-interpolator uses the JVM default
    // locale, and a comma-decimal host would emit invalid JSON here
    val q = names.map(n => "\"" + n + "\":" +
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(best(n)))).mkString(",")
    println(s"""{"crossover_spark":{$q},"dir":"$dir","reps":$reps}""")
    // semantic_dedup's registered query DERIVES its cluster count from the
    // corpus (C = max(16, n/1000) — SemDeDup's own C ∝ n knob), so the
    // sf-pinned cells=16 oracle in oracle_sql.json replays the WRONG
    // configuration at crossover scale. Emit a matching-C oracle override
    // for crossover.py to merge before its DuckDB pass — both engines then
    // run the same clustering.
    if (names.contains("semantic_dedup")) {
      val n = graft.Tables.embeddings(spark, dir).count()
      val cells = graft.ops.Similarity.semanticCells(n)
      val sql = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .writeValueAsString(SparkEntry.semanticDedupSql(cells))
      println(s"""{"oracle_sql_overrides":{"semantic_dedup":$sql},"derived_cells":$cells}""")
    }
    spark.stop()
  }
}
