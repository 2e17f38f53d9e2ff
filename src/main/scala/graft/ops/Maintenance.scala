package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset maintenance (SURVEY.md §2 D11): small-file compaction. A
  * long-running epoch-partitioned stream (queue sink, dedup-ingest index)
  * accrues one small file per epoch; at cluster scale the resulting
  * listing/open overhead dominates reads long before data volume does.
  * Compaction rewrites a directory into size-targeted files.
  *
  * The file census comes from the filesystem listing (metadata-only, no
  * data read); the rewrite is one `repartition(n)` pass — a single shuffle
  * sized so output files land near `targetBytes`. The write goes to a NEW
  * directory: swap-on-success (rename/replace) keeps readers consistent,
  * mirroring how table formats commit compactions.
  */
object Maintenance {

  /** Total bytes + file count under `dir` (recursive, data files only —
    * every path component under `dir` must be non-hidden by Spark's
    * convention: no '_' or '.' prefix, which also skips the `_temporary`
    * subtree debris of in-flight or failed writes).
    */
  def fileCensus(spark: SparkSession, dir: String): (Long, Long) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = path.toUri.getPath
    val it = fs.listFiles(path, true)
    var bytes = 0L
    var files = 0L
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
      val hidden = rel.split("/").exists(seg => seg.startsWith("_") || seg.startsWith("."))
      if (!hidden) { bytes += f.getLen; files += 1 }
    }
    (bytes, files)
  }

  /** Compact the parquet data under `inDir` into `outDir` with files sized
    * near `targetBytes`. Returns (rows, filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Long, Long, Long) = {
    val (bytes, before) = fileCensus(spark, inDir)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    df.repartition(nOut).write.mode("overwrite").parquet(outDir)
    val rows = spark.read.parquet(outDir).count()
    val (_, after) = fileCensus(spark, outDir)
    (rows, before, after)
  }

  /** The compacted frame for callers that want to keep composing. */
  def compacted(spark: SparkSession, inDir: String,
                targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val (bytes, _) = fileCensus(spark, inDir)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(nOut)
  }
}
