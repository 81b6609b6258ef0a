package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** madCensus must (1) compute median/MAD exactly in doubled integer
  * units, (2) flag planted spikes a mean/stddev gate would let the
  * contamination itself absorb, and (3) stay partition-independent.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("planted spike is a z>3 outlier; median/MAD exact in doubled units") {
    // group a: 9 values around 10 plus one spike of 1000
    val a = Seq(8L, 9L, 9L, 10L, 10L, 10L, 11L, 11L, 12L, 1000L).map(("a", _))
    // group b: constant — MAD 0, no outliers, null max_z
    val b = Seq.fill(5)(("b", 7L))
    val df = (a ++ b).toDF("g", "x")
    val out = RobustStats.madCensus(df, "g", col("x"))
      .orderBy("g").collect()
    val ra = out(0)
    // a: median 10 (med2=20); devs |x-10| = 2,1,1,0,0,0,1,1,2,990 →
    // sorted 0,0,0,1,1,1,1,2,2,990 → median 1 (mad4=4)
    assert(ra.getAs[Long]("med2") == 20L && ra.getAs[Long]("mad4") == 4L)
    // spike: |1000-10| = 990 = 990×MAD → z_milli = 990000
    assert(ra.getAs[Long]("max_z_milli") == 990000L)
    assert(ra.getAs[Long]("n_out_z3") == 1L)
    val rb = out(1)
    assert(rb.getAs[Long]("med2") == 14L && rb.getAs[Long]("mad4") == 0L)
    assert(rb.isNullAt(rb.fieldIndex("max_z_milli")))
    assert(rb.getAs[Long]("n_out_z3") == 0L)
  }

  test("calibratedRankPpm: monotone in value, bounded, comparable across scales") {
    // two groups with the SAME shape at different scales: calibration
    // must assign corresponding elements the same rank
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).map(("a", _))
    val b = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).map(x => ("b", x * 100L))
    val df = (a ++ b).toDF("g", "v")
    val out = ApproxQuantiles.calibratedRankPpm(df, "g", "v")
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getAs[Long]("v"), r.getAs[Long]("rank_ppm")))
    val ra = out.filter(_._1 == "a").map(_._3).toSeq
    val rb = out.filter(_._1 == "b").map(_._3).toSeq
    // monotone non-decreasing in value, within [0, 1e6)
    assert(ra.zip(ra.tail).forall { case (x, y) => x <= y })
    assert(ra.forall(r => r >= 0 && r < 1000000L))
    // small values sit in exact bins (v < 16), so the two same-shape
    // groups calibrate identically where binning is exact
    assert(ra.head == 0L && rb.head == 0L)
    assert(ra == Seq(0L, 125000L, 250000L, 375000L, 500000L, 625000L,
      750000L, 875000L))
    // b's coarse high bins may merge ties but ranks stay ordered
    assert(rb.zip(rb.tail).forall { case (x, y) => x <= y })
  }

  test("even-count interpolation stays integer-exact; partition-independent") {
    // x = 3,4,5,6 → median 4.5 → med2 = 9; dev2 = |2x−9| = 3,1,1,3 →
    // mad4 = median(2·dev2) = median(6,2,2,6) = 4 (= 4·MAD, MAD = 1)
    val df = Seq(3L, 4L, 5L, 6L).map(("g", _)).toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      RobustStats.madCensus(d, "g", col("x")).collect().head
    val r = run(df)
    assert(r.getAs[Long]("med2") == 9L && r.getAs[Long]("mad4") == 4L)
    val re = run(df.repartition(5))
    assert(r.toSeq == re.toSeq)
  }
}
