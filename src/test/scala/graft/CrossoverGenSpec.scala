package graft

import graft.tools.CrossoverGen
import org.scalatest.funsuite.AnyFunSuite

/** Pins the crossover generator's contract: the committed CROSSOVER.json is
  * only evidence if the corpus behind it is reproducible (pure per-id rows)
  * and actually has the testdata shapes the generator's scaladoc claims —
  * planted duplicate structure in the documents, strictly time-ordered
  * events with the measured value family. Pure-function tests, no Spark
  * session needed.
  */
class CrossoverGenSpec extends AnyFunSuite {

  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
  private val types = Array("click", "error", "purchase", "signup", "view")

  test("docText is a pure function of (id, vocab) and plants exact duplicates") {
    val n = 20000
    val texts = Array.tabulate(n)(i => CrossoverGen.docText(i.toLong, vocab))
    // determinism: a second evaluation reproduces every row
    (0 until n by 997).foreach { i =>
      assert(CrossoverGen.docText(i.toLong, vocab) === texts(i))
    }
    // planted exact-duplicate rate ~0.2%: a dup doc equals an EARLIER doc
    val dups = texts.zipWithIndex.count { case (t, i) =>
      texts.indexOf(t) < i
    }
    assert(dups > n / 2000, s"expected planted exact duplicates, found $dups")
    // word-salad bodies stay inside the documented 8-110 word range
    // (duplicate donors inherit their donor's bounds)
    val lens = texts.map(_.split(" ").length)
    assert(lens.min >= 8 && lens.max <= 135, // 110 words + max spliced span
      s"word counts ${lens.min}..${lens.max} outside the documented shape")
  }

  test("eventRow keeps ts strictly increasing and the measured marginals") {
    val n = 100000
    val nUsers = n / 67L
    val startUs = 1704067200000000L
    val stepUs = 30L * 86400L * 1000000L / n
    val rows = Array.tabulate(n)(i =>
      CrossoverGen.eventRow(i.toLong, nUsers, startUs, stepUs, types))
    // determinism
    (0 until n by 9973).foreach { i =>
      assert(CrossoverGen.eventRow(i.toLong, nUsers, startUs, stepUs, types) === rows(i))
    }
    // the real sf0.1 table has ZERO ts inversions in event_id order; the
    // jitter bound must preserve that at any scale
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 < b._2, s"ts inversion between ${a._1} and ${b._1}")
    }
    // users cover the scaled range; value family is Exponential(mean 50)
    // (median 50·ln2 ≈ 34.66 — the statistic that pinned the family)
    assert(rows.map(_._3).distinct.length > nUsers * 0.95)
    val values = rows.map(_._5).sorted
    val median = values(n / 2)
    assert(math.abs(median - 34.66) < 1.5, s"median $median off the family")
    assert(values.head >= 0.0)
    // props stay the {"k": 0..99} shape every row
    assert(rows.forall(r => r._6.matches("""\{"k": \d{1,2}\}""")))
  }
}
