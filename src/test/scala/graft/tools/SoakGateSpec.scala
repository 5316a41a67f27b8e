package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The injected-regression canary for the soak's engine-state gate
  * (r15 verdict #3 / r16 ADVICE): the gate arithmetic the 300-tick run
  * uses — [[Soak.engineFlat]], [[Soak.componentWindow]], [[Soak.median]]
  * — exercised with synthetic latency series, INCLUDING a planted aged
  * regression that must fail. These are the pure functions the combined
  * soak's verdict rests on; if a refactor bends any of them (window
  * bounds off-by-one, a flipped ratio, a mean sneaking in for the
  * median), this spec fails before a 50-minute soak run has to. */
class SoakGateSpec extends AnyFunSuite {

  test("engineFlat: aged within 1.5x of fresh passes, beyond fails") {
    assert(Soak.engineFlat(freshWindow = 1.0, agedWindow = 1.0))
    assert(Soak.engineFlat(freshWindow = 1.0, agedWindow = 1.5)) // boundary inclusive
    assert(!Soak.engineFlat(freshWindow = 1.0, agedWindow = 1.51))
    // r5's real leak signature was 2-10x aged — must always fail
    assert(!Soak.engineFlat(freshWindow = 0.8, agedWindow = 1.72))
  }

  test("injected regression canary: a 2x-bent aged window fails the gate a flat one passes") {
    // two child runs with identical fresh-JVM cost shape: the first W
    // ticks pay compilation (slow), then steady state. The AGED series
    // is the same run with an injected engine-state bend: steady state
    // 2x the fresh one — the exact signature the fresh-child-JVM pair
    // exists to catch, with JVM-age effects cancelled by construction.
    val w = 100
    def series(steady: Double): Seq[Double] =
      Seq.fill(w)(steady * 5.0) ++ Seq.fill(w)(steady) ++ Seq.fill(50)(steady * 1.1)
    val fresh = Soak.componentWindow(series(0.8))
    val agedFlat = Soak.componentWindow(series(0.85)) // box noise, not a leak
    val agedBent = Soak.componentWindow(series(1.6))  // injected 2x regression
    assert(Soak.engineFlat(fresh, agedFlat))
    assert(!Soak.engineFlat(fresh, agedBent))
  }

  test("componentWindow: skips the first W compilation ticks, reads W..2W only") {
    // 300 ticks, W = min(100, 150) = 100: window = ticks 100..199.
    // Plant distinct values per region so a bounds slip changes the answer.
    val lat = Seq.fill(100)(9.0) ++ Seq.fill(100)(1.0) ++ Seq.fill(100)(5.0)
    assert(Soak.componentWindow(lat) === 1.0)
    // short series: W = size/2 — window is exactly the second half
    val short = Seq.fill(10)(9.0) ++ Seq.fill(10)(2.0)
    assert(Soak.componentWindow(short) === 2.0)
  }

  test("componentWindow window W..2W never reads past the series (200-tick child run)") {
    // the engineProbe children run exactly 200 ticks: W=100, window
    // 100..200 — the final tick must be included, none past the end
    val lat = Seq.fill(100)(9.0) ++ Seq.fill(99)(1.0) :+ 101.0
    assert(Soak.componentWindow(lat) === 1.0) // median robust to the last spike
    assert(Soak.componentWindow(Seq.fill(100)(9.0) ++ Seq.fill(100)(3.0)) === 3.0)
  }

  test("median: odd, even, empty, unsorted input") {
    assert(Soak.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Soak.median(Seq(4.0, 1.0, 3.0, 2.0)) === 2.5)
    assert(Soak.median(Seq.empty) === 0.0)
    assert(Soak.median(Seq(7.0)) === 7.0)
  }
}
