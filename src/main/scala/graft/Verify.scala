package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional name filter for single-query iteration (tools/parity.py
    // passes its `names...` through); empty = the driver's full dump
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      // Merge to one file WITHOUT losing the query's ORDER BY: the oracle
      // compare matches rows positionally, and a bare repartition(1)'s
      // round-robin shuffle does not guarantee the reduce task concatenates
      // map outputs in order (it happens to in local mode — a latent
      // cluster bug). monotonically_increasing_id() stamps the sorted
      // output (range partitions are ordered by partition id, so the ids
      // are globally ascending), the shuffle moves the rows, and the
      // within-partition sort on the id restores the order exactly. Still
      // NOT coalesce(1): that would fold the whole query's final stage
      // into one task (the narrow-dependency collapse banned in SURVEY §4);
      // this keeps the compute wide and re-sorts only the dumped rows.
      try fn(spark, sfDir)
        .withColumn("__row", org.apache.spark.sql.functions.monotonically_increasing_id())
        .repartition(1).sortWithinPartitions("__row").drop("__row")
        .write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // bound cache growth across the persisting queries; also drop bare
      // persistent RDDs (localCheckpoint debris from the iterative ops —
      // the cache manager does not own those, same lesson as Bench)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      Jsons.obj(SparkEntry.oracleSql))
    spark.stop()
  }
}
