package graft

import org.scalatest.funsuite.AnyFunSuite

class FixtureClockSpec extends AnyFunSuite {

  test("nested brackets accumulate once (outermost only)") {
    FixtureClock.reset()
    FixtureClock.time {
      Thread.sleep(20)
      FixtureClock.time { Thread.sleep(20) } // helper bracketing its own body
    }
    val outer = FixtureClock.nanos
    assert(outer >= 40000000L, s"outer bracket must cover both sleeps, got $outer")
    // double-counting would exceed wall-clock: outer + inner ≈ 60ms+
    assert(outer < 55000000L, s"nested bracket double-counted: $outer")
  }

  test("sequential brackets add; reset clears; result passes through") {
    FixtureClock.reset()
    assert(FixtureClock.time { 42 } == 42)
    FixtureClock.time { Thread.sleep(5) }
    FixtureClock.time { Thread.sleep(5) }
    assert(FixtureClock.nanos >= 10000000L)
    FixtureClock.reset()
    assert(FixtureClock.nanos == 0L)
    // a throwing bracket still accounts its time and rethrows
    intercept[RuntimeException](FixtureClock.time {
      Thread.sleep(5); throw new RuntimeException("boom")
    })
    assert(FixtureClock.nanos >= 5000000L)
  }
}
