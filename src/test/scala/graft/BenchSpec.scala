package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench integrity: a failing query must never contribute a time — not to
  * its per-query entry, not to the total. Round 5 shipped a bench whose
  * total silently EXCLUDED the real cost of 28 broken queries while
  * including their ~0.06 s times-to-failure; these tests pin the honest
  * behavior (failure → NaN pass → excluded from min → query absent from
  * results, present in `failed`/`n_failed`). */
class BenchSpec extends AnyFunSuite {

  test("timed: success yields elapsed seconds, failure yields the exception") {
    val ok = Bench.timed(() => ())
    assert(ok.isRight)
    assert(ok.toOption.get >= 0.0)
    val boom = new RuntimeException("boom")
    val bad = Bench.timed(() => throw boom)
    assert(bad === Left(boom))
  }

  test("minSuccessful ignores failed (NaN) passes") {
    assert(Bench.minSuccessful(Seq(2.0, 1.5, 3.0)) === Some(1.5))
    assert(Bench.minSuccessful(Seq(Double.NaN, 1.5)) === Some(1.5))
    assert(Bench.minSuccessful(Seq(1.5, Double.NaN)) === Some(1.5))
  }

  test("minSuccessful is None when every pass failed — query excluded, not fast") {
    assert(Bench.minSuccessful(Seq(Double.NaN, Double.NaN)) === None)
    assert(Bench.minSuccessful(Seq.empty) === None)
  }
}
