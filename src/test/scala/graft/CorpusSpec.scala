package graft

import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** Corpus-preparation operators (SURVEY.md §2 B11-B13). */
class CorpusSpec extends SparkSpec {

  test("train split: every doc assigned, deterministic across runs, fractions near 90/5/5") {
    val split = Corpus.trainSplit(spark, sf0001)
    val total = Tables.documents(spark, sf0001).count()
    assert(split.count() === total)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train").toDouble / total > 0.8, s"counts=$counts")
    assert(counts("train").toDouble / total < 0.97, s"counts=$counts")
    // content-free determinism: the same doc lands in the same split again
    val again = Corpus.trainSplit(spark, sf0001).collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val first = split.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(again === first)
  }

  test("corpus stats cover every doc exactly once") {
    val stats = Corpus.corpusStats(spark, sf0001)
    val total = Tables.documents(spark, sf0001).count()
    assert(stats.agg(sum("n_docs")).collect().head.getLong(0) === total)
    assert(stats.where(col("n_tokens") <= 0 || col("avg_doc_tokens") <= 0).count() === 0)
  }

  test("contamination reports only cross-set pairs that truly share 8-grams") {
    val hits = Corpus.contamination(spark, sf0001, minOverlap = 1).collect()
    hits.foreach { r =>
      assert(r.getAs[Long]("eval_id") % 50 === 0, "eval side must come from the eval sample")
      assert(r.getAs[Long]("corpus_id") % 50 !== 0, "corpus side must not be in the eval sample")
      assert(r.getAs[Long]("n_shared") >= 1)
    }
    // an eval doc always shares all its 8-grams with an exact copy: plant one
    // by comparing a doc against itself via the pair math (sanity: the join
    // is on shingle hashes, so a full-overlap pair would surface) — the
    // blocked exact-Jaccard operator provides the ground truth for overlap
    val plan = Corpus.contamination(spark, sf0001).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"all-pairs join in plan:\n$plan")
  }
}
