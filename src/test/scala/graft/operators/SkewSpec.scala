package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting must be semantically invisible: salted plans produce exactly
  * the unsalted results, while spreading hot keys across reducers.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed() = {
    // one hot key (90%), two cold keys
    val rows = (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 60).map(i => ("warm", i.toLong)) ++
      (1 to 40).map(i => ("cold", i.toLong))
    rows.toDF("k", "v")
  }

  test("saltedSum equals plain groupBy sum/count") {
    val df = skewed()
    val salted = Skew.saltedSum(df, Seq("k"),
        Seq("n" -> lit(1L), "total" -> col("v")), factor = 8)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = df.groupBy("k")
      .agg(sum(lit(1L)).as("n"), sum("v").as("total"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("AQE splits a skewed join partition at runtime — plans stay re-plannable") {
    // manual salting (above) is the deterministic fix; AQE's skew-join
    // split is the runtime one. Prove OUR declarative join shape stays
    // eligible: with thresholds lowered to test scale, the executed plan
    // must show a skew-handled SortMergeJoin (isSkew=true partitions).
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // thresholds sized to the COMPRESSED shuffle bytes (50k identical
      // short strings compress to a few KB — an 8KB threshold never trips)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 50k rows on ONE key ensures a fat partition vs the 3 others
      val big = (1 to 50000).map(i => ("hot", i.toLong)) ++
        (1 to 50).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong), ("c", i.toLong)))
      val right = (1 to 200).map(i => ("hot", i)) ++
        Seq(("a", 1), ("b", 2), ("c", 3))
      // TWO constraints discovered the hard way, both worth pinning:
      // (1) a groupBy on the JOIN key right after the join pins the
      //     join's output partitioning and AQE refuses to skew-split —
      //     a global aggregate leaves the join free to split;
      // (2) skew-split divides a fat reduce partition along MAPPER
      //     ranges, so a single-partition local input (one mapper)
      //     can never split — spread the input first.
      val j = big.toDF("k", "v").repartition(16, col("v"))
        .join(right.toDF("k", "t"), Seq("k"))
        .agg(count(lit(1)).as("n"))
      val n = j.collect().head.getLong(0)
      assert(n == 50000L * 200 + 3 * 50) // correctness through the split
      // the top-level executedPlan prints only the AdaptiveSparkPlan
      // wrapper; the FINAL adaptive plan carries the skew markers
      val executed = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(executed.contains("skew=true") || executed.contains("isSkewJoin=true"),
        s"AQE must mark the hot partition as skew-split:\n${executed.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedJoin equals plain join row-for-row") {
    val big = skewed()
    val dim = Seq(("hot", 1), ("warm", 2), ("cold", 3), ("absent", 4))
      .toDF("k", "tag")
    val salted = Skew.saltedJoin(big, dim, Seq("k"), factor = 4)
      .groupBy("k", "tag").count().orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val plain = big.join(dim, Seq("k"))
      .groupBy("k", "tag").count().orderBy("k").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
    assert(salted.map(_._1).toSet == Set("hot", "warm", "cold"))
  }
}
