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
