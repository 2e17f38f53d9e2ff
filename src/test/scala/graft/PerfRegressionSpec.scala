package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Perf-regression tripwire (r8 verdict stretch #8): no registered query may
  * regress past [[PerfGate]]'s thresholds against its PERF_BASELINE.json
  * record.
  *
  * The measurement itself is `graft.Bench` (`make bench`), which writes its
  * untruncated result line to `bench_latest.json` alongside the committed
  * baseline `PERF_BASELINE.json`; this spec compares the two artifacts with
  * the SAME [[PerfGate]] rule Bench embeds in its `regressions` field, so
  * the suite and the round driver's bench line can never disagree.
  *
  * Why two gates (see PerfGate's scaladoc for the full argument): for
  * queries with a real (≥50 ms) DuckDB anchor the comparison is
  * ratio-vs-ratio — absolute seconds on this host drift with external load
  * while the interleaved anchor cancels noise from both sides. For
  * sub-50 ms anchors the ratio's denominator is measurement noise (r9's
  * false trip: `resume_tokens_last` at 3.1× ratio on an unchanged trivial
  * groupBy against a 7-9 ms anchor), so those gate on Spark wall instead:
  * 3× the baseline wall AND >0.3 s absolute growth.
  *
  * The spec is deliberately NOT the measurement: re-running the full bench
  * inside `sbt test` would double the suite wall and put timing noise
  * inside the green bar the suite guarantees. Instead it gates on the
  * artifact: cancels (with the run recipe) when no local bench has run,
  * fails loudly when one has and a query regressed. `make tripwire` chains
  * bench + this spec as the one-command check.
  */
class PerfRegressionSpec extends AnyFunSuite {

  private def maps(path: String) = {
    val node = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    import scala.jdk.CollectionConverters._
    def m(field: String) = node.path(field).fields().asScala
      .map(e => e.getKey -> e.getValue.asDouble()).toMap
    (m("spark_over_duckdb"), m("queries"), m("duckdb"))
  }

  test("no registered query regressed past PerfGate vs its recorded baseline") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("PERF_BASELINE.json")),
      "no PERF_BASELINE.json committed at the repo root")
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("bench_latest.json")),
      "no local bench artifact — run `make bench` (graft.Bench writes " +
        "bench_latest.json), then re-run this spec; `make tripwire` does both")
    val (baseRatio, baseWall, _) = maps("PERF_BASELINE.json")
    val (curRatio, curWall, curDuck) = maps("bench_latest.json")
    assume(curRatio.nonEmpty,
      "bench_latest.json has no spark_over_duckdb map — the bench ran " +
        "without its DuckDB anchor (python3/duckdb unavailable?)")
    val regressed = curRatio.keySet.toSeq.sorted.collect {
      case q if PerfGate.regressed(
        curWall.getOrElse(q, 0.0), curDuck.getOrElse(q, 0.0),
        baseWall.getOrElse(q, 0.0), baseRatio.getOrElse(q, 0.0)) =>
        PerfGate.describe(q, curWall(q), curDuck(q),
          baseWall.getOrElse(q, 0.0), baseRatio.getOrElse(q, 0.0))
    }
    // Coverage sanity: the baseline must actually cover the current query
    // set, or a renamed query silently drops out of the tripwire. Collected
    // BEFORE asserting so a round that both regresses one query and renames
    // another reports both problems, not just the first.
    val uncovered = curRatio.keySet -- baseRatio.keySet
    val problems =
      (if (regressed.isEmpty) Nil
       else Seq(s"${regressed.size} queries regressed past PerfGate vs " +
         s"PERF_BASELINE.json:\n  ${regressed.mkString("\n  ")}\n(a trip " +
         "means a plan change — check .explain for a lost pushdown, a " +
         "new exchange, or a broadcast turned sort-merge)")) ++
      (if (uncovered.isEmpty) Nil
       else Seq(s"queries missing from PERF_BASELINE.json (re-record it): $uncovered"))
    assert(problems.isEmpty, "\n" + problems.mkString("\n"))
  }

  // ---- the >10x crossover evidence gate (r15, VERDICT r14 #2) ------------

  /** Families allowed above the bar WITHOUT a CROSSOVER.json measured
    * entry — each waiver names, in one line, where its evidence lives
    * instead. Empty today: every family (including the cdc pair, which
    * lives in `spark_sec`/`spark_only_sec` with the oracle-OOM story in
    * `cdc_note`) is measured. A stale waiver — one whose family is no
    * longer above the bar OR now has a measured entry — fails the gate,
    * so the list is self-pruning like PlanGuard's whitelists. */
  private val crossoverWaivers: Map[String, String] = Map.empty

  test("every >10x sf0.1 family carries crossover evidence: a CROSSOVER.json entry or a named waiver") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("bench_latest.json")),
      "no local bench artifact — run `make bench` first")
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("CROSSOVER.json")),
      "no CROSSOVER.json committed at the repo root")
    val (curRatio, _, _) = maps("bench_latest.json")
    assume(curRatio.nonEmpty, "bench_latest.json has no spark_over_duckdb map")
    val cj = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get("CROSSOVER.json")))
    import scala.jdk.CollectionConverters._
    def keys(field: String) = cj.path(field).fieldNames().asScala.toSet
    val measured = keys("spark_sec") ++ keys("spark_only_sec")
    // The repo's own evidence bar (SURVEY §6 / VERDICT r13+): an sf0.1
    // ratio above 10x is either a sub-second job floor or a real plan
    // defect, and only a 50x measurement distinguishes them — so every
    // such family must carry one. Measured preemptively down to ~5x in
    // tools/crossover.py so host drift between rounds cannot push an
    // unmeasured family over the bar.
    val over = curRatio.filter(_._2 > 10.0).keySet
    val missing = (over -- measured -- crossoverWaivers.keySet).toSeq.sorted
    val stale = crossoverWaivers.keySet.filter(w =>
      !over.contains(w) || measured.contains(w)).toSeq.sorted
    val problems =
      (if (missing.isEmpty) Nil
       else Seq(s"families over the 10x bar with no crossover evidence " +
         s"(add to tools/crossover.py's lists and re-measure, or waive " +
         s"with a one-line reason): $missing")) ++
      (if (stale.isEmpty) Nil
       else Seq(s"stale crossover waivers (family no longer >10x or now " +
         s"measured — delete the waiver): $stale"))
    assert(problems.isEmpty, "\n" + problems.mkString("\n"))
  }

  test("the floor-normalized aggregate is present and bounded by the plain ratio") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("bench_latest.json")),
      "no local bench artifact — run `make bench` first")
    val node = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get("bench_latest.json")))
    assume(node.has("ratio_vs_duckdb"), "bench ran without its DuckDB anchor")
    assume(node.has("ratio_excess_vs_duckdb"),
      "bench_latest.json predates the r16 floor-normalized field — re-run `make bench`")
    val plain = node.path("ratio_vs_duckdb").asDouble()
    val excess = node.path("ratio_excess_vs_duckdb").asDouble()
    // per-query max(0, wall − floor) ≤ wall, summed over the same shared
    // keys and divided by the same anchor total — so the excess ratio is
    // non-negative and can never exceed the plain ratio
    assert(excess >= 0.0, s"excess ratio must be non-negative, got $excess")
    assert(excess <= plain + 1e-9,
      s"excess ratio $excess exceeds the plain ratio $plain — the floor " +
        "subtraction or the shared-key set diverged between the two aggregates")
  }

  test("the floor-normalized aggregate is GATED against its pinned baseline (r17)") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("PERF_BASELINE.json")),
      "no PERF_BASELINE.json committed at the repo root")
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("bench_latest.json")),
      "no local bench artifact — run `make bench` first")
    // Both sides recomputed over the INTERSECTION of the two artifacts'
    // per-query keys (ADVICE r17 #2): the pinned scalar was computed when
    // the registry was smaller, so gating the current (grown) registry's
    // scalar against it shifts the statistic every round that adds a query
    // with no real regression. Same rule as Bench's `regressions` field.
    val (_, baseWall, baseDuck) = maps("PERF_BASELINE.json")
    val (_, curWall, curDuck) = maps("bench_latest.json")
    assume(curDuck.nonEmpty, "bench ran without its DuckDB anchor")
    assume(baseDuck.nonEmpty,
      "PERF_BASELINE.json predates the per-query duckdb map — " +
        "re-record the baseline from a full bench line")
    val inter = curWall.keySet & curDuck.keySet & baseWall.keySet & baseDuck.keySet
    val keys = inter.filter(k => curWall(k) > 0 && curDuck(k) > 0 &&
      baseWall(k) > 0 && baseDuck(k) > 0)
    def excess(wall: Map[String, Double], duck: Map[String, Double]): Double = {
      val d = keys.toSeq.map(duck).sum
      if (d > 0) keys.toSeq
        .map(k => math.max(0.0, wall(k) - PerfGate.jobFloorSec)).sum / d
      else -1.0
    }
    val base = excess(baseWall, baseDuck)
    val cur = excess(curWall, curDuck)
    assume(cur > 0 && base > 0, "intersection carries no anchored work")
    assert(!PerfGate.excessRegressed(cur, base),
      f"aggregate floor-normalized ratio $cur%.3f (over the ${keys.size} " +
        f"shared keys) exceeds ${PerfGate.excessTolerance}x its pinned " +
        f"baseline $base%.3f — real work drifted across the folded sub-1.5s " +
        "queries even though no per-query gate tripped; diff " +
        "bench_latest.json's per-query walls against PERF_BASELINE.json " +
        "to find the spread")
  }

  // ---- the gate itself, pinned case by case ------------------------------

  test("the aggregate excess gate trips at 2x and stays quiet below (pinned)") {
    // r16's measured value 0.819 as the pin: 1.9x stays quiet, 2.05x trips
    assert(!PerfGate.excessRegressed(curExcess = 0.819 * 1.9, baseExcess = 0.819))
    assert(PerfGate.excessRegressed(curExcess = 0.819 * 2.05, baseExcess = 0.819))
    // missing evidence never trips: anchorless run (0) or pre-field baseline
    assert(!PerfGate.excessRegressed(curExcess = 0.0, baseExcess = 0.819))
    assert(!PerfGate.excessRegressed(curExcess = 5.0, baseExcess = 0.0))
  }


  test("anchored queries (≥50ms) need BOTH the ratio leg and the wall leg (r18)") {
    // ratio 2.0 vs baseline 0.5 = 4x > 3x AND wall 0.5→2.0s (4x, +1.5s):
    // a genuine regression trips both legs
    assert(PerfGate.regressed(curSpark = 2.0, curDuck = 1.0,
      baseSpark = 0.5, baseRatio = 0.5))
    // 2.9x ratio growth stays under the wire regardless of walls
    assert(!PerfGate.regressed(curSpark = 1.45, curDuck = 1.0,
      baseSpark = 0.5, baseRatio = 0.5))
    // wall quadrupled but the anchor grew with it (host load taxing both
    // columns): ratio leg quiet, no trip
    assert(!PerfGate.regressed(curSpark = 2.0, curDuck = 4.0,
      baseSpark = 0.5, baseRatio = 0.5))
  }

  test("an anchor-side collapse is anchor_drift, not a regression (r17's semantic_contamination, verbatim)") {
    // The r17 false trip: Spark wall 1.128→1.256s (1.11x, unchanged plan)
    // while DuckDB's recursive-CTE anchor collapsed 76.29→20.93s, so
    // ratio-vs-ratio read 0.060/0.0148 = 4.06x > 3x and fired. The
    // hardened gate must NOT trip (the Spark wall never moved) …
    val (cs, cd, bs, br) = (1.256, 20.93, 1.128, 1.128 / 76.29)
    assert(!PerfGate.regressed(cs, cd, bs, br))
    // … and must CLASSIFY it as anchor drift so the bench line still
    // surfaces the shift for adjudication and re-pin
    assert(PerfGate.anchorDrift(cs, cd, bs, br))
    // a genuine regression is NOT drift: both legs fired → regressed only
    assert(!PerfGate.anchorDrift(curSpark = 2.0, curDuck = 1.0,
      baseSpark = 0.5, baseRatio = 0.5))
    // ratio quiet → no drift either
    assert(!PerfGate.anchorDrift(curSpark = 1.45, curDuck = 1.0,
      baseSpark = 0.5, baseRatio = 0.5))
  }

  test("sub-floor anchors need BOTH 3x wall and 0.3s absolute growth") {
    // the r9 false trip, verbatim: resume_tokens_last wall 0.319→0.781s
    // against a 9ms anchor (ratio 35.4→111.6 = 3.1x) must NOT trip —
    // 2.4x wall growth is inside host-drift territory
    assert(!PerfGate.regressed(curSpark = 0.781, curDuck = 0.009,
      baseSpark = 0.319, baseRatio = 35.447))
    // a real defect on the same query: wall 0.319→1.5s (4.7x, +1.18s) trips
    assert(PerfGate.regressed(curSpark = 1.5, curDuck = 0.009,
      baseSpark = 0.319, baseRatio = 35.447))
    // 3x-plus multiple but tiny absolute growth (0.05→0.2s) stays quiet:
    // both legs of the compound are required
    assert(!PerfGate.regressed(curSpark = 0.2, curDuck = 0.009,
      baseSpark = 0.05, baseRatio = 5.0))
    // big absolute growth but under 3x (0.9→1.9s) also stays quiet
    assert(!PerfGate.regressed(curSpark = 1.9, curDuck = 0.009,
      baseSpark = 0.9, baseRatio = 100.0))
  }

  test("the floor boundary routes to the ratio+wall gate at exactly 50ms") {
    // anchor exactly at the floor: both legs required — ratio 80 vs 5
    // (16x) AND wall 0.9→4.0s (4.4x, +3.1s) → trips
    assert(PerfGate.regressed(curSpark = 4.0, curDuck = 0.05,
      baseSpark = 0.9, baseRatio = 5.0))
    // same walls but the anchor grew too (ratio 2.0 vs 1.5, quiet):
    // at/above the floor the ratio leg gates it out …
    assert(!PerfGate.regressed(curSpark = 4.0, curDuck = 2.0,
      baseSpark = 0.9, baseRatio = 1.5))
    // … while just under the floor the wall gate alone applies and trips
    assert(PerfGate.regressed(curSpark = 4.0, curDuck = 0.049,
      baseSpark = 0.9, baseRatio = 1.5))
    // at the floor with ratio fired but wall quiet (1.1x): no trip —
    // that is the anchor_drift class
    assert(!PerfGate.regressed(curSpark = 1.0, curDuck = 0.05,
      baseSpark = 0.9, baseRatio = 5.0))
    assert(PerfGate.anchorDrift(curSpark = 1.0, curDuck = 0.05,
      baseSpark = 0.9, baseRatio = 5.0))
  }

  test("failed samples and missing baseline entries never trip") {
    assert(!PerfGate.regressed(curSpark = -1.0, curDuck = 1.0,
      baseSpark = 0.5, baseRatio = 0.5))
    assert(!PerfGate.regressed(curSpark = 2.0, curDuck = 0.0,
      baseSpark = 0.5, baseRatio = 0.5))
    assert(!PerfGate.regressed(curSpark = 2.0, curDuck = 1.0,
      baseSpark = 0.5, baseRatio = 0.0))
    // sub-floor anchor with no baseline wall recorded: no trip either
    assert(!PerfGate.regressed(curSpark = 2.0, curDuck = 0.009,
      baseSpark = 0.0, baseRatio = 5.0))
  }
}
