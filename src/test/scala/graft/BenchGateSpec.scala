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
}
