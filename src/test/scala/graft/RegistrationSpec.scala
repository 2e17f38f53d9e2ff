package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registration-trail tripwire (VERDICT r12 ask #5): the same
  * late-registration mistake reddened two boards in a row — a query landed
  * in `SparkEntry.queries` without its SURVEY.md §2 row and/or its
  * PERF_BASELINE.json coverage entry, and the gap surfaced only at judge
  * time. This spec makes the invariant fail at COMMIT time with a named
  * list instead: every registered query key must appear
  *
  *  (a) in SURVEY.md (a §2 row cites the key in backticks — SURVEY is the
  *      coverage contract the verdict grades line by line; code ahead of
  *      SURVEY is unauditable coverage), and
  *  (b) in PERF_BASELINE.json's `queries` wall map (so the perf tripwire
  *      actually covers it — PerfRegressionSpec's own coverage check only
  *      sees queries once a bench artifact exists, i.e. too late for a
  *      round that registers without re-benching), unless explicitly
  *      waived below with a justification.
  *
  * Plus the cheap structural invariants the driver's compare assumes:
  * every oracle key is a registered query, and bench extras never collide
  * with registered keys.
  */
class RegistrationSpec extends AnyFunSuite {

  /** Queries exempt from the PERF_BASELINE coverage requirement. A waiver
    * is for a query whose measurement is structurally meaningless (none
    * today) — NOT for "the bench hasn't run yet": registering a query and
    * deferring its baseline entry is exactly the failure mode this spec
    * exists to catch. Each entry needs a justification comment.
    */
  private val perfWaivers: Set[String] = Set.empty

  private def read(p: String) =
    java.nio.file.Files.readString(java.nio.file.Paths.get(p))

  test("every registered query has a SURVEY.md §2 mention") {
    val survey = read("SURVEY.md")
    val missing = SparkEntry.queries.keySet.filterNot(k => survey.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"queries registered without a SURVEY.md row (write the §2 row — " +
        s"SURVEY is the coverage contract): ${missing.toSeq.sorted}")
  }

  test("every registered query has a PERF_BASELINE.json entry or a waiver") {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(read("PERF_BASELINE.json"))
    import scala.jdk.CollectionConverters._
    val covered = node.path("queries").fieldNames().asScala.toSet
    val missing = SparkEntry.queries.keySet -- covered -- perfWaivers
    assert(missing.isEmpty,
      s"queries registered without PERF_BASELINE.json coverage (run the " +
        s"full sf0.1 bench and merge the new walls/ratios — see Makefile " +
        s"`make bench`): ${missing.toSeq.sorted}")
    val stale = (covered -- SparkEntry.queries.keySet)
      .filterNot(SparkEntry.benchExtras.keySet)
    assert(stale.isEmpty,
      s"PERF_BASELINE.json covers unregistered queries (renamed/removed — " +
        s"prune them so the tripwire tracks the live set): ${stale.toSeq.sorted}")
  }

  test("every oracle key is a registered query, and bench extras never collide") {
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracleSql entries without a matching queries entry: ${orphanOracles.toSeq.sorted}")
    val collisions = SparkEntry.benchExtras.keySet.intersect(SparkEntry.queries.keySet)
    assert(collisions.isEmpty,
      s"benchExtras keys shadowing registered queries: ${collisions.toSeq.sorted}")
  }
}
