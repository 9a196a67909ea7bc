package graft

import org.scalatest.funsuite.AnyFunSuite

/** The suite budget gate must fire on an injected slowdown and stay quiet
  * inside budget — pure-logic checks (the timing loop itself is exercised
  * by every driver bench run).
  */
class BenchGateSpec extends AnyFunSuite {

  test("parseBaseline reads the flat per-query map, tolerating whitespace") {
    val m = Bench.parseBaseline(
      """{"q_a": 1.5, "q_b":0.25,
        |  "q_c" : 12.0}""".stripMargin)
    assert(m == Map("q_a" -> 1.5, "q_b" -> 0.25, "q_c" -> 12.0))
    assert(Bench.parseBaseline("") == Map.empty)
  }

  test("budget gate fires on an injected 2x slowdown, stays quiet inside " +
    "budget, and never flags un-budgeted queries") {
    val budget = Map("q_a" -> 1.5, "q_b" -> 0.25)
    assert(!Bench.isSlow("q_a", 2.9, budget)) // inside 2x
    assert(Bench.isSlow("q_a", 3.1, budget)) // injected slowdown
    assert(Bench.isSlow("q_b", 0.51, budget))
    assert(!Bench.isSlow("q_new", 99.0, budget)) // no budget -> no flag
    assert(!Bench.isSlow("q_a", 3.1, Map.empty)) // no file -> gate off
  }

  test("scaling-pair gate fires on an injected throttled pair and names " +
    "it by index; a clean run flags nothing") {
    // injected throttle: pair 2 ran one leg into a load episode
    val noisy = Seq(0.91, 0.88, 0.42, 0.85, 0.93, 0.82, 0.90)
    assert(Bench.slowPairs(noisy) == Seq("scaling_pair_2_eff_0.420"))
    // clean run: all pairs at/above threshold
    assert(Bench.slowPairs(Seq(0.85, 0.70, 0.93)).isEmpty)
    // boundary: strictly-below flags, equal does not
    assert(Bench.slowPairs(Seq(0.699)).nonEmpty)
    assert(Bench.slowPairs(Seq.empty).isEmpty)
  }
}
