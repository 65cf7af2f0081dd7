package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[Dec8.scaled8]] must equal the BigDecimal canonical path —
  * `new BigDecimal(Double.toString(x)).setScale(8, HALF_UP).unscaledValue`
  * — exactly, whenever it does not return the Fallback sentinel; and it
  * must return Fallback (never a wrong value) outside the long range.
  * Pure JVM property test, no Spark session. */
class Dec8ParitySpec extends AnyFunSuite {

  private def oracle(s: String): java.math.BigInteger =
    new java.math.BigDecimal(s)
      .setScale(8, java.math.RoundingMode.HALF_UP).unscaledValue()

  private def check(x: Double): Unit = {
    val s = java.lang.Double.toString(x)
    val f = Dec8.scaled8(s)
    if (f != Dec8.Fallback)
      assert(java.math.BigInteger.valueOf(f) === oracle(s), s"for input $s")
    else {
      // fallback must be the only escape for values outside ~long range
      val o = oracle(s)
      assert(o.bitLength >= 60 || o.abs.compareTo(
        java.math.BigInteger.valueOf(1000000000000000000L)) >= 0,
        s"unnecessary fallback for $s (oracle $o)")
    }
  }

  test("uniform-exponent magnitude sweep: fast path == BigDecimal digits") {
    val rnd = new scala.util.Random(42L)
    var i = 0
    while (i < 500000) {
      val e = rnd.nextInt(640) - 320 // 1e-320 .. 1e318, incl. subnormals
      val x = (rnd.nextDouble() * 2 - 1) * math.pow(10, e)
      if (!x.isNaN && !x.isInfinite) check(x)
      i += 1
    }
  }

  test("float-widened embedding/stat magnitudes (the hot-path population)") {
    val rnd = new scala.util.Random(7L)
    var i = 0
    while (i < 500000) {
      val x = (rnd.nextFloat() * 2e6f - 1e6f).toDouble
      check(x); check(x * x); check(x * x * x)
      i += 1
    }
  }

  test("HALF_UP boundaries, zeros, and denormal/huge edges") {
    val edges = Seq(
      0.0, -0.0, 1e-9, -1e-9, 5e-9, -5e-9, 4.999999999e-9, 1.5e-8, 2.5e-8,
      -2.5e-8, 0.000000005, 0.000000015, -0.000000015, 1.0, -1.0,
      0.1, 0.123456785, 0.123456775, 1e10, -1e10, 9.99999999e9,
      1e17, 1e18, 9.2e9, 9.223372036854775e9, -9.223372036854775e9,
      java.lang.Double.MIN_VALUE, -java.lang.Double.MIN_VALUE,
      java.lang.Double.MAX_VALUE, -java.lang.Double.MAX_VALUE,
      4.9e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
      123456789.987654321, -123456789.987654321)
    edges.foreach(check)
    // every representable scale-8 value in a small dense band
    var u = -200000L
    while (u <= 200000L) { check(u / 1e8); u += 1 }
  }
}
