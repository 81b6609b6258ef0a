package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[LongArrayQuantize.quantizeOne]] fast path to the exact
  * string-based HALF_UP semantics of the original BigDecimal-only form
  * (r15 optimization: the Double.toString inside BigDecimal.valueOf was
  * the top non-Spark frame of the similarity-query profiles). The fast
  * path must be bit-identical: any value within one ulp of a k + 0.5
  * boundary — where shortest-decimal-repr rounding can legitimately
  * differ from binary rounding — must still route through BigDecimal.
  */
class QuantizeBoundarySpec extends AnyFunSuite {

  private def reference(v: Double): Long = {
    val scaled = v * 1000.0
    if (java.lang.Double.isNaN(scaled) ||
        java.lang.Double.isInfinite(scaled)) scaled.toLong
    else
      java.math.BigDecimal.valueOf(scaled)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .doubleValue()
        .toLong
  }

  test("fast path matches BigDecimal HALF_UP on boundary sweeps") {
    val probes = Seq.newBuilder[Double]
    // exact and near .5 boundaries in the embedding milli range
    for (k <- -2000 to 2000) {
      val b = (k + 0.5) / 1000.0
      probes += b
      for (eps <- Seq(1e-16, 1e-13, 1e-10, 1e-7, 1e-4)) {
        probes += b + eps
        probes += b - eps
      }
    }
    // nextUp/nextDown around boundaries: the exact ulp frontier
    for (k <- Seq(-7, -1, 0, 1, 3, 999)) {
      val b = (k + 0.5) / 1000.0
      probes += Math.nextUp(b)
      probes += Math.nextDown(b)
    }
    // large magnitudes where ulp(scaled) >> 1e-9
    for (m <- Seq(1e9, 1e12, 4.5e15, 9.007199254740992e15)) {
      probes += m / 1000.0 + 0.0005
      probes += m / 1000.0
    }
    // deterministic pseudo-random sweep
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100000) probes += (rnd.nextDouble() * 2 - 1)
    probes += Double.NaN
    probes += Double.PositiveInfinity
    probes += Double.NegativeInfinity
    for (v <- probes.result()) {
      assert(LongArrayQuantize.quantizeOne(v) === reference(v),
        s"mismatch at v=$v (scaled=${v * 1000.0})")
    }
  }
}
