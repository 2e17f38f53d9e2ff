package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Perf-regression tripwire (r8 verdict stretch #8): no registered query's
  * same-session Spark/DuckDB ratio may exceed 3x its recorded baseline.
  *
  * The measurement itself is `graft.Bench` (`make bench`), which writes its
  * untruncated result line to `bench_latest.json` alongside the committed
  * baseline `PERF_BASELINE.json`; this spec compares the two artifacts. The
  * comparison is ratio-vs-ratio, NOT seconds-vs-seconds, because absolute
  * seconds on this host drift with external load (identical code has
  * totaled 46-83 s across rounds) while the interleaved DuckDB anchor
  * shares each Spark pass's stall windows, so the ratio cancels host noise
  * from both sides of the division.
  *
  * Tolerance 3x (documented per the verdict's ask): the worst observed
  * same-query ratio drift on an UNCHANGED plan round-over-round is ~1.6x,
  * while the failure modes this guards against — a lost pushdown, a new
  * shuffle, a broadcast turned sort-merge — cost integer multiples. A
  * trip therefore means a plan change, not a loud host.
  *
  * The spec is deliberately NOT the measurement: re-running the full bench
  * inside `sbt test` would double the suite wall and put timing noise
  * inside the green bar the suite guarantees. Instead it gates on the
  * artifact: cancels (with the run recipe) when no local bench has run,
  * fails loudly when one has and a ratio regressed. `make tripwire` chains
  * bench + this spec as the one-command check; the round driver's own
  * bench run also embeds the same comparison (Bench's `regressions` field),
  * so every round is checked even if nobody runs the make target.
  */
class PerfRegressionSpec extends AnyFunSuite {

  private val tolerance = 3.0

  private def ratios(path: String) = {
    val node = new ObjectMapper().readTree(
      java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val m = node.path("spark_over_duckdb")
    import scala.jdk.CollectionConverters._
    m.fields().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
  }

  test("no registered query's same-session ratio exceeds 3x its recorded baseline") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("PERF_BASELINE.json")),
      "no PERF_BASELINE.json committed at the repo root")
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get("bench_latest.json")),
      "no local bench artifact — run `make bench` (graft.Bench writes " +
        "bench_latest.json), then re-run this spec; `make tripwire` does both")
    val base = ratios("PERF_BASELINE.json")
    val cur = ratios("bench_latest.json")
    assume(cur.nonEmpty,
      "bench_latest.json has no spark_over_duckdb map — the bench ran " +
        "without its DuckDB anchor (python3/duckdb unavailable?)")
    val regressed = cur.toSeq.sortBy(_._1).collect {
      case (q, r) if base.getOrElse(q, 0.0) > 0 && r > tolerance * base(q) =>
        f"$q: ratio $r%.2f vs baseline ${base(q)}%.2f (${r / base(q)}%.1fx)"
    }
    // Coverage sanity: the baseline must actually cover the current query
    // set, or a renamed query silently drops out of the tripwire. Collected
    // BEFORE asserting so a round that both regresses one query and renames
    // another reports both problems, not just the first.
    val uncovered = cur.keySet -- base.keySet
    val problems =
      (if (regressed.isEmpty) Nil
       else Seq(s"${regressed.size} queries regressed >${tolerance}x vs " +
         s"PERF_BASELINE.json:\n  ${regressed.mkString("\n  ")}\n(a trip at " +
         "3x means a plan change — check .explain for a lost pushdown, a " +
         "new exchange, or a broadcast turned sort-merge)")) ++
      (if (uncovered.isEmpty) Nil
       else Seq(s"queries missing from PERF_BASELINE.json (re-record it): $uncovered"))
    assert(problems.isEmpty, "\n" + problems.mkString("\n"))
  }
}
