package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide plan invariants over EVERY registered query (SURVEY.md §4):
  * individual specs pin per-operator plan shapes; this guard keeps future
  * edits from quietly reintroducing the two scale-killers anywhere in the
  * surface — cartesian products and non-scalar nested-loop joins.
  *
  * Planning only: `executedPlan` builds the physical plan without running
  * jobs — since r9 EVERY registered query constructs lazily (the driver-
  * iterative builders sit behind [[graft.plans.DeferredFrame]]); for those
  * the guard forces the thunk explicitly and sweeps the INNER plan, so
  * deferral cannot hide a scale-killer join from this check.
  */
class PlanGuardSpec extends SparkSpec {

  /** The physical plan to audit: for a deferred frame, the inner plan the
    * thunk actually executes (running its driver-side rounds — cheap at
    * sf0.001); otherwise the query's own executedPlan.
    */
  private def auditPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.logical match {
      case graft.plans.DeferredRelation(_, thunk) =>
        thunk().queryExecution.executedPlan.toString
      case _ => df.queryExecution.executedPlan.toString
    }

  /** Queries whose ONLY nested-loop join is a broadcast of a 1-row scalar
    * aggregate (count/median/total rows) — the pattern the verdict
    * adjudicated as sound: the build side is one row by construction, so
    * "nested loop" degenerates to attaching constants.
    */
  private val scalarBroadcastOk = Set(
    "doc_top_terms",      // broadcast n_docs scalar
    "stratified_sample",  // broadcast min-class-size scalar
    "temperature_sample", // broadcast min-class-size scalar
    "contamination",      // broadcast eval-sample row count
    "collocations",       // broadcast total-token scalar
    "lm_perplexity",      // broadcast vocabulary-size scalar
    "ppl_buckets",        // composed on lm_perplexity: inherits its V scalar;
                          // its own per-lang cutoff join is a keyed broadcast
    "dsir_select",        // broadcast corpus/target-total + vocab scalars
    "rfm_segments",       // broadcast 1-row anchor-date + quintile-cutoff scalars
    "rfm_segments_approx", // same scaffold, sketch cutoffs — same 1-row attaches
    "split_divergence",   // broadcast split-totals (<=3 rows by construction) + V scalar
    "corpus_pipeline",    // composed: inherits the scalar joins above
    "dedup_incremental",  // broadcast epoch scalar
    "bm25_search",        // broadcast 1-row (N, sum_dl) corpus-stats scalar
    "hybrid_search",      // inherits bm25's corpus-stats scalar; its query
                          // vectors broadcast like ann_brute's probe set
                          // (bounded by construction, not by data)
    "hybrid_search_ivf",  // same lexical pool: inherits bm25's corpus-stats
                          // scalar; the IVF semantic side is equi-join-only
    "lm_trigram_ppl",     // broadcast 1-row (N, vocab) scalar — lm_perplexity's
                          // V scalar one n-gram order higher
    "source_lm_divergence", // broadcast global-vocab scalar (the source-local
                          // model's V attaches by a keyed source join)
    "daily_fill",         // broadcast 1-row (min_day, max_day) span scalar
    "source_concentration", // broadcast 1-row top-k-volume scalar
    "basket_affinity",    // broadcast 1-row order-count scalar
    "source_lang_drift",  // broadcast grand-total scalar + the language
                          // inventory (bounded by construction, like
                          // ann_brute's probe set)
    "ann_brute_topk",     // DELIBERATE baseline: broadcast of the k probe
                          // vectors (bounded by construction, not by data)
                          // against the corpus; ann_lsh/ann_ivf are the
                          // scale paths and stay equi-join-only
    "ann_truncated_rerank", // same bounded probe-set broadcast as ann_brute;
                          // the coarse pass scans prefix dims, the exact
                          // pass is candidate-bounded per query
    "q22_dormant",        // broadcast 1-row (Σbal, n) average-balance scalar
    "q15_top_supplier",   // broadcast 1-row max-revenue scalar
    "q11_important",      // broadcast 1-row (Σvalue, n_parts) stock-value scalar
    "signal_agreement",   // same signal join as quality_ensemble: inherits
                          // lm_perplexity's V scalar; its own pair sums
                          // collapse to ONE aggregate row, no further join
    "quality_ensemble",   // broadcast 1-row corpus-moments scalar (decimal
                          // sums/sums-of-squares for the three z-scores);
                          // inherits lm_perplexity's V scalar too
    "ann_recall_report",  // composes ann_brute + ann_truncated verbatim —
                          // inherits their bounded probe-set broadcasts;
                          // its own fusion joins are left-semi equi-joins
                          // over ≤ nQueries·k rows + a 1-row n_expected
                          // scalar
    "basket_affinity_top" // broadcast 1-row order-count scalar (the exact
                          // sibling's), plus the top-set rides as an array
                          // LITERAL (no join at all)
  )

  test("no registered query plans a CartesianProduct; nested loops only for 1-row scalars") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try auditPlan(fn(spark, sf0001))
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      val cartesian = plan.contains("CartesianProduct")
      val nestedLoop = plan.contains("BroadcastNestedLoopJoin") && !scalarBroadcastOk(name)
      if (cartesian || nestedLoop)
        Some(s"$name: cartesian=$cartesian unexpectedNestedLoop=$nestedLoop")
      else None
    }
    assert(offenders.isEmpty, s"scale-killer join shapes found:\n${offenders.mkString("\n")}")
  }

  /** Queries whose global (un-partitioned) window runs over an input that
    * is BOUNDED BY CONSTRUCTION — a prior aggregate collapses the frame to
    * calendar/key-space cardinality before the window sees it, so the
    * single window task holds days or event-types, never rows-of-the-fact.
    * Everything else must partition its windows: a global window over an
    * unbounded input serializes the whole table through one task — the
    * same class of scale-killer as a cartesian, now guarded mechanically
    * (VERDICT r11 #7) instead of by review convention.
    */
  private val globalWindowOk = Map(
    "daily_trend" -> "trailing RANGE frame over the per-day aggregate (calendar cardinality)",
    "training_order" -> ("prefix-sum over the ≤2^shardBits-row shard table (the constant " +
      "partition key folds away; the CORPUS-width window stays sharded)"),
    "novelty_curve" -> "cumulative sum over the per-source aggregate (source cardinality)",
    "zipf_fit" -> "rank window over the token-vocab AGGREGATE (vocab cardinality, not corpus rows)"
  )

  test("no registered query plans a global (un-partitioned) window over an unbounded input") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val hasGlobal = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sf0001)
      // logical traversal (not string matching): window specs are fixed at
      // analysis, and the optimized plan sits below any AQE wrapper.
      // Optimized (not analyzed): constant folding may legitimately EMPTY a
      // spec (training_order's lit key) or keep one non-empty — the plan
      // that runs is the one audited.
      val plan = df.queryExecution.logical match {
        case graft.plans.DeferredRelation(_, thunk) => thunk().queryExecution.optimizedPlan
        case _ => df.queryExecution.optimizedPlan
      }
      val hits = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      if (hits.nonEmpty) Some(name) else None
    }.toSet
    val offenders = hasGlobal -- globalWindowOk.keySet
    assert(offenders.isEmpty,
      s"un-audited global windows (single-task at scale) in: ${offenders.toSeq.sorted.mkString(", ")} — " +
        "partition the window or add an audited bounded-input justification")
    // keep the whitelist honest: an entry whose query no longer plans a
    // global window is stale documentation and must be removed
    val stale = globalWindowOk.keySet -- hasGlobal
    assert(stale.isEmpty, s"stale globalWindowOk entries (no global window planned): " +
      s"${stale.toSeq.sorted.mkString(", ")}")
  }

  test("driver-iterative builders construct lazily behind a deferred leaf") {
    // VERDICT r8 #3: planning dup_clusters used to execute the LSH subtree.
    // The structural guarantee: constructing these queries yields a
    // DeferredRelation leaf — creation builds attributes and a thunk,
    // nothing that can launch a job; the gate count and propagation rounds
    // run at the first action (CurationSpec's collects cover execution).
    for (name <- Seq("dup_clusters", "cluster_keep_best", "bpe_learn", "bpe_encode")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.queryExecution.logical.isInstanceOf[graft.plans.DeferredRelation],
        s"$name should construct as a deferred leaf")
    }
  }

  test("filter-heavy scans push their predicates into parquet") {
    // Queries whose FIRST thing is a selective predicate on a scanned
    // column: the filter must reach the parquet reader (PushedFilters),
    // or at 100 TB the scan reads everything and filters after.
    // (funnel_counts is deliberately absent: its n_users denominator
    // counts users with ANY event, so the full scan is the semantics)
    val mustPush = Seq("q1_agg", "q3_join", "q6_agg", "daily_trend",
      "asof_join", "range_join", "viewers_no_purchase")
    val offenders = mustPush.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
      if (pushed) None else Some(name)
    }
    assert(offenders.isEmpty,
      s"no parquet-pushed filters in: ${offenders.mkString(", ")}")
  }
}
