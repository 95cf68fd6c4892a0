package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's median rule (VERDICT r11 #8): a row's reported seconds
  * is the LOWER-middle of its sorted runs — the true median for the 3-run
  * base case, and sorted index 1 for a 4-run contended-rescue array, so the
  * mechanic discounts exactly ONE spiked run and never more. */
class BenchSpec extends AnyFunSuite {

  test("3-run base case: true median") {
    assert(Bench.runMedian(Seq(3.0, 1.0, 2.0)) === 2.0)
  }

  test("4-run rescue case: lower-middle (sorted index 1)") {
    // one spiked run out of four is discounted...
    assert(Bench.runMedian(Seq(1.0, 9.0, 1.2, 1.1)) === 1.1)
    // ...but two spiked runs are NOT: the lower-middle of (1.0, 8, 9, 1.1)
    // is 1.1 — still a clean run — yet with three spiked runs the result is
    // a spiked value, i.e. the rule can never hide sustained contention
    assert(Bench.runMedian(Seq(1.0, 8.0, 9.0, 7.0)) === 7.0)
  }

  test("even-size arrays always take the lower middle, never average") {
    assert(Bench.runMedian(Seq(1.0, 2.0)) === 1.0)
    assert(Bench.runMedian(Seq(4.0, 1.0, 3.0, 2.0)) === 2.0)
  }
}
