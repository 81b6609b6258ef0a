package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** K7 plan-shape pin: the join of the two bucketed tables must be
  * CO-LOCATED — zero shuffle exchanges anywhere under the join, on
  * either side, with broadcast disabled so the shape under test is the
  * one a 100 TB fact-fact join would take (neither side broadcastable).
  * The k6-style answer gate can only grade "identical"; this asserts
  * "shuffle-free".
  */
class BucketedJoinSpec extends SparkSpec {

  test("k7: bucketed fact-fact join plans with zero exchanges below the join") {
    val dir = "/root/testdata/sf0.001"
    val (oT, lT) = CoreQueries.bucketedTables(spark, dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(lT)
        .join(spark.table(oT), col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${p.take(1200)}")
      // the layout really is the catalog's bucket spec, not luck
      assert(spark.catalog.tableExists(oT) && spark.catalog.tableExists(lT))

      // and the answer from the store equals the answer from raw parquet
      val fromStore = joined
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val li = Tables.load(spark, dir, "lineitem")
      val o = Tables.load(spark, dir, "orders")
      val fromRaw = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(fromStore == fromRaw)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
