package graft.tools

import graft.BenchHarness
import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Skew-join evidence probe (SURVEY D7): a synthetic fact-fact equi-join
  * with 90% of the probe side on ONE key, measured three ways —
  *
  *   runMain graft.tools.SkewProbe [nBig] [nOther] [saltBuckets]
  *
  *  - `unsplit`: sort-merge join with AQE's skew handling OFF — the
  *    baseline proving the hot key really does pin one task;
  *  - `aqe`: AQE skew-split ON (thresholds lowered to act at probe scale;
  *    production defaults split at 256 MB partitions — same mechanism,
  *    bigger granules);
  *  - `salted`: [[Skew.saltedJoin]] — spreads the hot key over
  *    `saltBuckets` tasks at the cost of replicating the OTHER side
  *    ×saltBuckets through the shuffle (the documented trade vs AQE's
  *    free runtime split; salting remains the tool when even one split
  *    granule of a single key overwhelms a task, or the engine's split
  *    cannot apply — e.g. aggregations keyed on the hot key).
  *
  * Reports per-task shuffle-read max/mean for the heaviest stage of each
  * run ([[Skew.stageLoadOf]]) plus walls, as one JSON line for splicing
  * into CROSSOVER.json.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val nBig = if (args.length > 0) args(0).toLong else 20000000L
    val nOther = if (args.length > 1) args(1).toLong else 2000000L
    val salt = if (args.length > 2) args(2).toInt else 32
    val nKeys = 100000L
    val spark = BenchHarness.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    // 90% of `a` on key 0; the rest uniform over 1..nKeys. `b` uniform over
    // 0..nKeys — a couple of rows per key, fact-shaped on both sides (the
    // hot key must NOT be hot on b too, or the join output itself explodes
    // quadratically — that is a data-model bug, not a partitioning one).
    def a = spark.range(nBig).select(
      when(col("id") % 10 < 9, lit(0L))
        .otherwise(pmod(hash(col("id")), lit(nKeys)).cast("long") + 1L).as("key"),
      col("id").as("pa"))
    def b = spark.range(nOther).select(
      (col("id") % (nKeys + 1L)).as("key"), col("id").as("pb"))

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n"), sum(col("pa")).as("sa"), sum(col("pb")).as("sb"))
        .collect().head

    val conf = spark.conf
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    var results = Map.empty[String, (Skew.StageLoad, String)]
    def run(tag: String, skewJoin: Boolean)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      var row: org.apache.spark.sql.Row = null
      val load = Skew.stageLoadOf(spark) { row = agg(mk) }
      results += tag -> (load, row.toString)
      println(f"[skewprobe] $tag: imbalance=${load.imbalance}%.2f tasks=${load.nTasks} " +
        f"max=${load.maxRecords} mean=${load.meanRecords}%.0f wall=${load.wallSec}%.2f agg=$row")
    }

    run("unsplit", skewJoin = false)(a.join(b, "key"))
    run("aqe", skewJoin = true)(a.join(b, "key"))
    run("salted", skewJoin = false)(Skew.saltedJoin(a, b, "key", salt))

    val aggs = results.map(_._2._2).toSet
    require(aggs.size == 1, s"strategies disagree on the join result: $results")
    val j = results.map { case (t, (l, _)) =>
      f""""$t":{"imbalance":${l.imbalance}%.2f,"tasks":${l.nTasks},"max_records":${l.maxRecords},"mean_records":${l.meanRecords}%.0f,"wall_sec":${l.wallSec}%.2f}"""
    }.mkString(",")
    println(s"""{"skew_probe":{$j},"n_big":$nBig,"n_other":$nOther,"salt_buckets":$salt}""")
    spark.stop()
  }
}
