package graft.vpts

/** Python-`str()`-compatible number rendering.
  *
  * The reference serializes every cell with pandas `astype(str)`, i.e.
  * Python's shortest-repr float formatting (`vpts.py:123,134`). Java's
  * legacy `Double.toString` differs (e-notation thresholds, occasional
  * non-shortest output), so golden-file byte parity needs an explicit
  * implementation: find the shortest round-tripping decimal, then apply
  * Python's positional/scientific rules (positional iff -4 <= exp10 < 16).
  */
object PyFormat {

  def pyFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val a = math.abs(d)
    // shortest precision whose %.*e round-trips. Searching up from 0 costs
    // ~17 String.format calls for full-precision doubles (f32-widened
    // profile values), so seed from Double.toString's significant-digit
    // count and verify/minimize around it (round-trip success is monotone
    // in precision, so the minimum found is identical).
    val js = java.lang.Double.toString(a)
    val eIdx = js.indexOf('E')
    var sig = 0
    var seenNz = false
    var ci = 0
    val mantEnd = if (eIdx >= 0) eIdx else js.length
    while (ci < mantEnd) {
      val c = js.charAt(ci)
      if (c >= '0' && c <= '9') {
        if (c != '0') seenNz = true
        if (seenNz) sig += 1
      }
      ci += 1
    }
    var p = math.max(0, math.min(17, sig - 1))
    def fmt(pp: Int): String =
      String.format(java.util.Locale.ROOT, "%." + pp + "e", Double.box(a))
    var s = fmt(p)
    if (s.toDouble != a) {
      while (s.toDouble != a && p < 17) { p += 1; s = fmt(p) }
    } else {
      var shrinking = p > 0
      while (shrinking) {
        val t = fmt(p - 1)
        if (t.toDouble == a) { s = t; p -= 1; shrinking = p > 0 }
        else shrinking = false
      }
    }
    // s = "d.dddde±XX"
    val Array(mant, expStr) = s.split("e")
    val exp = expStr.toInt
    val digits = mant.replace(".", "")
    val body =
      if (exp >= 16 || exp < -4) {
        // scientific, python style: 1e+16, 1.234e-05
        val m = if (digits.length == 1) digits else digits.head + "." + digits.tail
        val es = (if (exp < 0) "-" else "+") + f"${math.abs(exp)}%02d"
        s"${m}e$es"
      } else if (exp >= digits.length - 1) {
        // integer-valued: pad zeros, add .0
        digits + "0" * (exp - digits.length + 1) + ".0"
      } else if (exp >= 0) {
        digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
      } else {
        "0." + "0" * (-exp - 1) + digits
      }
    if (neg) "-" + body else body
  }

  /** str() of a value that numpy `astype(float32)` produced: the f32 is
    * widened exactly to double and repr'd (`vpts.py:58-63` tolist()).
    */
  def pyFloat32(f: Float): String = pyFloat(f.toDouble)

  /** numpy-compatible round-half-even to `scale` decimals: np.round's own
    * algorithm (scale by 10^n, rint, divide — numpy documents it as fast but
    * inexact). Decimal-string-based rounding (BigDecimal.valueOf) diverges on
    * tie-adjacent binary doubles, e.g. 2.675 (really 2.67499999999999982…)
    * rounds to 2.68 via the shortest decimal repr but 2.67 in numpy.
    */
  def roundHalfEven(d: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    math.rint(d * p) / p
  }
}
