package graft.vpts

import org.scalatest.funsuite.AnyFunSuite

/** Python-str rendering parity properties (the invariant the golden-file
  * byte-compare depends on).
  */
class PyFormatSpec extends AnyFunSuite {

  test("known python reprs") {
    assert(PyFormat.pyFloat(11.0) == "11.0")
    assert(PyFormat.pyFloat(5.3) == "5.3")
    assert(PyFormat.pyFloat(-8.041890144348145) == "-8.041890144348145")
    assert(PyFormat.pyFloat(0.000123) == "0.000123")
    assert(PyFormat.pyFloat(0.0000123) == "1.23e-05")
    assert(PyFormat.pyFloat(1.0e16) == "1e+16")
    assert(PyFormat.pyFloat(1.5e16) == "1.5e+16")
    assert(PyFormat.pyFloat(123456789.0) == "123456789.0")
    assert(PyFormat.pyFloat(0.0) == "0.0")
    assert(PyFormat.pyFloat(-0.0) == "-0.0")
    assert(PyFormat.pyFloat(Double.NegativeInfinity) == "-inf")
    assert(PyFormat.pyFloat(8.131323814392090f.toDouble) == "8.13132381439209")
  }

  test("property: parse(pyFloat(d)) == d over random doubles") {
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val d = rnd.nextInt(5) match {
        case 0 => (rnd.nextDouble() - 0.5) * 1e12
        case 1 => (rnd.nextDouble() - 0.5) * 1e-3
        case 2 => (rnd.nextDouble() - 0.5) * 1e20
        case 3 => rnd.nextFloat().toDouble // f32-widened values (ODIM data)
        case _ => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case x if x.isNaN || x.isInfinite => 1.0
          case x => x
        }
      }
      val s = PyFormat.pyFloat(d)
      assert(s.toDouble == d, s"$d -> $s")
    }
  }

  test("property: pyFloat output is shortest (removing last digit breaks round-trip)") {
    val rnd = new scala.util.Random(7)
    (1 to 5000).foreach { _ =>
      val d = (rnd.nextDouble() - 0.5) * 1e6
      val s = PyFormat.pyFloat(d)
      val digits = s.filter(_.isDigit)
      if (digits.length > 1 && !s.contains("e")) {
        val truncated = s.dropRight(1)
        if (truncated.nonEmpty && truncated.last.isDigit)
          assert(truncated.toDouble != d || s.last == '0',
            s"$s not shortest for $d")
      }
    }
  }

  test("numpy-style half-even rounding") {
    assert(PyFormat.roundHalfEven(0.5, 0) == 0.0)
    assert(PyFormat.roundHalfEven(1.5, 0) == 2.0)
    assert(PyFormat.roundHalfEven(2.5, 0) == 2.0)
    assert(PyFormat.roundHalfEven(5.300000190734863, 6) == 5.3)
    assert(PyFormat.roundHalfEven(51.191700000000004, 6) == 51.1917)
  }
}
