package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Overlap.par contract: input-order results, all-threads-joined
  * semantics, and error propagation (a failing thunk must fail the
  * whole call — a silently dropped arm would silently drop a query
  * arm's computation). Pure driver-side: no SparkSession needed. */
class OverlapSpec extends AnyFunSuite {

  test("par returns results in input order regardless of finish order") {
    val r = Overlap.par(Seq(
      () => { Thread.sleep(50); "slow" },
      () => "fast"))
    assert(r == Seq("slow", "fast"))
  }

  test("par2/par3/par4 preserve types and order") {
    assert(Overlap.par2(1, "two") == ((1, "two")))
    assert(Overlap.par3(1, 2L, "3") == ((1, 2L, "3")))
    assert(Overlap.par4(1, 2, 3, 4) == ((1, 2, 3, 4)))
  }

  test("a failing thunk fails the call after all threads finish") {
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[RuntimeException] {
      Overlap.par(Seq(
        () => throw new RuntimeException("arm down"),
        () => { Thread.sleep(30); finished.set(true); 1 }))
    }
    assert(e.getMessage == "arm down")
    assert(finished.get(), "the surviving arm must run to completion")
  }

  test("the first failure wins when several thunks fail") {
    val e = intercept[RuntimeException] {
      Overlap.par(Seq(
        () => throw new RuntimeException("first"),
        () => { Thread.sleep(40); throw new RuntimeException("second") }))
    }
    assert(Set("first", "second").contains(e.getMessage))
  }

  test("par refuses an empty thunk list") {
    intercept[IllegalArgumentException] { Overlap.par(Seq.empty[() => Int]) }
  }
}
