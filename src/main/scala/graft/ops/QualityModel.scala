package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** B61 — distributed quality-classifier training: fit a logistic-regression
  * quality model on cheap per-doc text signals and score every document
  * with a calibrated keep-probability — the GPT-3/CCNet curation pattern
  * (a trained classifier, not a threshold stack, decides what enters the
  * corpus; WebText used an LR over hand features, CCNet a fasttext model).
  * Weak supervision: the labels are the B52 filter funnel's own pass/fail
  * verdict (shared predicate definitions — `Curation.funnelFlags` — so the
  * model distills exactly the registered gauntlet, then generalizes it to
  * a smooth score usable for soft sampling and threshold sweeps).
  *
  * Spark-native 100 TB shape (the embeddingPca recipe applied to GD):
  *  - featurization is one scan-speed projection (codegen'd shingle
  *    expression for the repetition signal, integer-ratio doubles
  *    elsewhere), persisted once — text never leaves the scan;
  *  - each of the `iters` full-batch gradient steps is ONE `treeAggregate`
  *    shipping a (d+1)-double dense gradient per partition (d = 5
  *    features) — no shuffle, no per-row state, executor-count-independent
  *    driver memory, exactly k passes over the cached feature frame;
  *  - the weight vector broadcasts per step (48 bytes) and the update runs
  *    on the driver — the bounded-collect contract the IVF centroids and
  *    BPE merge rows already follow;
  *  - scoring is a pure Column projection of the final weights.
  *
  * Determinism/replayability: the summed gradient is rounded to an 8-dp
  * grid before the weight step (and weights to the same grid), so the
  * float-addition order of `treeAggregate` (partition-dependent) cannot
  * leak into the published weights: any summation order lands on the same
  * grid point unless the true value sits within ~1e-12 of a half-step
  * (the embeddingPca round-6 discipline, two decimals finer because
  * gradient components are O(0.1)). QualityModelSpec replays the whole
  * pipeline — features from raw text, GD, scores — sequentially in local
  * Scala and matches `prob` to 1e-6.
  *
  * Rows-only registration (like bpe_*): the train loop is iterative
  * driver logic outside SQL, and scoring runs `exp`, so no bit-exact
  * cross-engine oracle exists. Lazy behind a DeferredFrame: construction
  * plans nothing, the k gradient jobs run at the first action.
  */
object QualityModel {

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("label", LongType, nullable = false),
    StructField("prob", DoubleType),
    StructField("predicted", BooleanType)))

  private def round8(x: Double): Double = math.rint(x * 1e8) / 1e8

  /** Feature columns over the documents table — bounded O(1)-scale signals
    * (GD conditioning), every one an engine-exact projection. Order is the
    * weight-vector order after the bias.
    */
  private def featureCols: Seq[(String, Column)] = {
    val tok = split(col("text"), " ")
    val nTok = size(tok).cast("double")
    Seq(
      "f_len" -> least(lit(1.0), col("n_chars").cast("double") / lit(1000.0)),
      "f_ntok" -> least(lit(1.0), nTok / lit(200.0)),
      "f_mean_tok" -> ((length(col("text")).cast("double") - (nTok - lit(1.0))) / nTok / lit(10.0)),
      "f_uniq" -> (size(array_distinct(tok)).cast("double") / nTok),
      "f_rep" -> Curation.dup2gramFrac)
  }

  def qualityClassifier(spark: SparkSession, dir: String, iters: Int = 40,
                        step: Double = 5.0, l2: Double = 1e-4): DataFrame =
    graft.plans.DeferredFrame(spark, outSchema)(() =>
      trainAndScore(spark, dir, iters, step, l2))

  private def trainAndScore(spark: SparkSession, dir: String, iters: Int,
                            step: Double, l2: Double): DataFrame = {
    val (p1, p2, p3) = Curation.funnelFlags(
      minChars = 100, maxChars = 20000, minWords = 30, maxRep = 0.07)
    // Persisted: feeds k gradient passes AND the final scoring projection.
    // Lazily persisted — released by graft.Caches.clear.
    val feats = Tables.documents(spark, dir)
      .select(Seq(col("doc_id"), (p1 && p2 && p3).cast("double").as("label")) ++
        featureCols.map { case (n, c) => c.as(n) }: _*)
      .persist()
    val d = featureCols.length + 1 // + bias
    val rows = feats
      .select(col("label"), array(lit(1.0) +: featureCols.map(f => col(f._1)): _*).as("x"))
      .rdd.map(r => (r.getDouble(0), r.getSeq[Double](1).toArray))
    val n = feats.count()
    require(n > 0, s"no documents under $dir")
    var w = new Array[Double](d)
    for (_ <- 1 to iters) {
      val bw = spark.sparkContext.broadcast(w)
      val grad = rows.treeAggregate(new Array[Double](d))(
        seqOp = (g, row) => {
          val ww = bw.value
          var dot = 0.0
          var i = 0
          while (i < d) { dot += ww(i) * row._2(i); i += 1 }
          val err = 1.0 / (1.0 + math.exp(-dot)) - row._1
          i = 0
          while (i < d) { g(i) += err * row._2(i); i += 1 }
          g
        },
        combOp = (a, b) => {
          var i = 0
          while (i < d) { a(i) += b(i); i += 1 }
          a
        })
      bw.destroy()
      // bias unregularized (index 0); both grid-rounds keep any summation
      // order on the same published weights (see object doc)
      w = Array.tabulate(d)(i =>
        round8(w(i) - step * (round8(grad(i) / n) + (if (i == 0) 0.0 else l2 * w(i)))))
    }
    val wx = (lit(w(0)) +: featureCols.zipWithIndex.map { case ((name, _), i) =>
      col(name) * lit(w(i + 1))
    }).reduce(_ + _)
    feats.select(col("doc_id"), col("label").cast("long").as("label"),
        round(lit(1.0) / (lit(1.0) + exp(-wx)), 6).as("prob"))
      .withColumn("predicted", col("prob") >= 0.5)
      .orderBy("doc_id")
  }
}
