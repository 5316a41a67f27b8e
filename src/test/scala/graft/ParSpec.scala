package graft

import org.scalatest.funsuite.AnyFunSuite

class ParSpec extends AnyFunSuite {

  test("mapBounded preserves order, drops None, runs concurrently") {
    val out = Par.mapBounded((1 to 20).toIndexedSeq, parallelism = 4) { i =>
      if (i % 3 == 0) None else Some(i * 10)
    }
    assert(out === (1 to 20).filterNot(_ % 3 == 0).map(_ * 10))
  }

  test("mapBounded drains every unit before rethrowing a failure") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val e = intercept[RuntimeException] {
      Par.mapBounded((1 to 8).toIndexedSeq, parallelism = 4) { i =>
        if (i == 2) throw new RuntimeException("boom")
        Thread.sleep(50)
        done.incrementAndGet()
        Some(i)
      }
    }
    assert(e.getMessage === "boom")
    // every non-failing unit finished BEFORE the throw surfaced — nothing
    // is still running in the background after mapBounded returns
    assert(done.get() === 7)
  }
}
