package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ApproxQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("logBin/binEstimate: estimate within the bin's relative-error bound") {
    // every value in [0, 200000): the reconstructed midpoint must sit
    // within 2^-(S+1) relative error of the original (exact below 2^S)
    val s = 4
    val rows = spark.range(0, 200000)
      .select(col("id").as("v"))
      .select(col("v"),
        ApproxQuantiles.binEstimate(
          ApproxQuantiles.logBin(col("v"), s), s).as("est"))
      .select(max(when(col("v") < (1L << s), abs(col("est") - col("v")))
          .otherwise(abs(col("est") - col("v")) / col("v"))).as("worst"))
      .head()
    assert(rows.getDouble(0) <= 1.0 / (1 << (s + 1)) + 1e-12,
      s"worst relative error ${rows.getDouble(0)}")
  }

  test("logBin is monotone non-decreasing (quantile order preserved)") {
    val s = 4
    val ids = spark.range(0, 100000).select(col("id").as("v"))
      .select(ApproxQuantiles.logBin(col("v"), s).as("id"), col("v"))
      .orderBy("v").as[(Long, Long)].collect().map(_._1)
    assert(ids.zip(ids.tail).forall { case (a, b) => a <= b })
  }

  test("quantilesByGroup: within bound of the exact nearest-rank answer") {
    // three groups with very different shapes: uniform, log-normal-ish
    // (squares), and a tiny group where the sketch is exact
    val data =
      (1L to 20000L).map(v => ("uniform", v)) ++
        (1L to 8000L).map(v => ("squares", v * v % 50021)) ++
        Seq(("tiny", 3L), ("tiny", 7L), ("tiny", 11L))
    val df = data.toDF("g", "v")
    val approx = ApproxQuantiles.quantilesByGroup(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    // exact nearest-rank per group, same rank definition
    val exact = data.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      Seq(1, 2, 3).map { num =>
        val rank = (sorted.size * num + 3) / 4 // ceil(q·n)
        (g, num - 1) -> sorted(rank - 1).toDouble
      }
    }
    exact.foreach { case (key, ex) =>
      val ap = approx(key)
      val relErr =
        if (ex < 16) math.abs(ap - ex) else math.abs(ap - ex) / ex
      assert(relErr <= 1.0 / 32 + 1e-12,
        s"$key: approx $ap vs exact $ex (relErr $relErr)")
    }
    assert(approx.size == 9)
  }

  test("sketch is partition-independent and bounded: grid cells ≤ 64·2^S") {
    val df = (1L to 50000L).map(v => ("g", v)).toDF("g", "v")
    val a = ApproxQuantiles.quantilesByGroup(df, "g", "v")
      .collect().map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    val b = ApproxQuantiles.quantilesByGroup(df.repartition(17), "g", "v")
      .collect().map(r => (r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a == b, "histogram sketch must not depend on physical layout")
    val cells = df
      .select(ApproxQuantiles.logBin(col("v"), 4).as("id"))
      .distinct().count()
    assert(cells <= 64 * 16, s"grid exploded to $cells cells")
  }
}
