package graft

import org.apache.spark.sql.SparkSession

/** Library-level cache hygiene. Several operators persist an intermediate
  * that feeds multiple consumers of the ONE returned plan (the sparse-
  * similarity index, bigramCoverage's per-doc counts, dupSpanTrim's shingle
  * starts, the minhash shingle frames): the cache fills during the caller's
  * action and stays resident afterwards, because a function returning a
  * lazy DataFrame has no post-action hook to unpersist from. That is the
  * right trade for a job that runs a pipeline and exits — and a leak for a
  * long-lived session running many pipelines. Such sessions call [[clear]]
  * between pipelines; the bench harness does exactly this between samples
  * (BenchHarness.dropCaches delegates here).
  *
  * Note for plan-only callers: `Similarity.ivfTopKOf` persists the
  * embeddings frame at plan CONSTRUCTION time — merely building the query
  * registers a cache entry that stays until [[clear]] runs (no jobs run
  * and no blocks fill until the plan executes). That is the documented
  * contract, not a leak: the persist is what lets the one action's
  * several corpus scans share a single pass.
  */
object Caches {

  /** Drop every cached block in the session: the SQL cache manager's
    * relations AND bare persistent RDDs (localCheckpoint blocks from the
    * iterative connected-components path are not owned by the cache
    * manager, so `spark.catalog.clearCache` alone would leave them
    * resident). Also drops the driver-side IVF centroid matrices cached
    * per index dir (KB-sized, but a cleared session should hold nothing).
    */
  def clear(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    graft.ops.Similarity.invalidateCentroidCache()
    graft.ops.Versioned.invalidateEpochCache()
    // QualityModel's weight memo deliberately survives: it caches a
    // deterministic computation result (48 bytes), not data blocks, and its
    // key embeds a file-metadata fingerprint of the documents table, so a
    // rewritten corpus misses the memo with no invalidation call needed —
    // see its scaladoc. QualityModel.invalidateWeightCache (public) exists
    // only to force a re-train cost measurement (bench's quality_train).
  }
}
