package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest at-or-before per key; null when none; keys isolated") {
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (1L, 10L, "p3"), (2L, 100L, "p4"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 20L, "q20"), (1L, 50L, "q50"), (1L, 80L, "q80"), (2L, 200L, "q200"))
      .toDF("k", "t", "quote")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("quote"))
      .orderBy("k", "t").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[String]("asof_quote")))
    assert(out.toSeq == Seq(
      (1L, 10L, null),   // before any right row
      (1L, 50L, "q50"),  // exact tie matches (at-or-before)
      (1L, 100L, "q80"), // latest prior
      (2L, 100L, null))) // other key's rows invisible
  }

  test("null attribute in the latest right row carries AS NULL — no stale resurrection") {
    // right rows: (t=1, a=5, b=10) then (t=2, a=null, b=20). The match
    // for a left row at t=3 is the WHOLE t=2 row → (null, 20); per-column
    // LOCF would resurrect a=5 and emit a hybrid row that never existed
    val left = Seq((1L, 3L, "x")).toDF("k", "t", "name")
    val right = Seq((1L, 1L, Some(5L), Some(10L)), (1L, 2L, None, Some(20L)))
      .toDF("k", "t", "a", "b")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("a", "b"))
      .collect().map(r =>
        (Option(r.getAs[java.lang.Long]("asof_a")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("asof_b")).map(_.toLong)))
    assert(out.toSeq == Seq((None, Some(20L))), out.toSeq)
    val salted = AsofJoin.asofJoinSalted(left, right, Seq("k"), "t", "t",
      Seq("a", "b"), bucketWidth = 10)
      .collect().map(r =>
        (Option(r.getAs[java.lang.Long]("asof_a")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("asof_b")).map(_.toLong)))
    assert(salted.toSeq == Seq((None, Some(20L))), salted.toSeq)
  }

  test("dedupeRight keeps max tiebreak per (key, time)") {
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 20L, 1L)).toDF("k", "t", "id")
    val d = AsofJoin.dedupeRight(right, Seq("k"), "t", "id")
      .orderBy("t").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(d.toSeq == Seq((10L, 9L), (20L, 1L)))
  }

  test("salted as-of == unsalted on mixed data incl. nulls-before-first and cross-bucket carry") {
    // hot key 1 dominates; carry-in must cross empty buckets (right rows
    // only early, left rows much later) and produce nulls before the
    // first right row
    val left = (1 to 500).map { i =>
      (if (i % 11 == 0) 2L else 1L, (i * 13L) % 997, s"p$i")
    }.toDF("k", "t", "name")
    val right = AsofJoin.dedupeRight(
      (1 to 120).map { i =>
        (if (i % 7 == 0) 2L else 1L, (i * 29L) % 331, s"q$i")
      }.toDF("k", "t", "quote"),
      Seq("k"), "t", "quote")

    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"),
        r.getAs[String]("name"), r.getAs[String]("asof_quote")))
      .sortBy(x => (x._1, x._2, x._3)).toSeq

    val plain = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("quote"))
    val salted = AsofJoin.asofJoinSalted(left, right, Seq("k"), "t", "t",
      Seq("quote"), bucketWidth = 50)
    assert(norm(salted) == norm(plain))
    // bucket width larger than the whole time range: degenerates to one
    // bucket per key and must still agree
    val oneBucket = AsofJoin.asofJoinSalted(left, right, Seq("k"), "t", "t",
      Seq("quote"), bucketWidth = 1000000)
    assert(norm(oneBucket) == norm(plain))
  }

  test("salted as-of spreads a hot key over many (key, bucket) partitions") {
    // ONE key carries every row — the unsalted operator would serialize
    // all 10k events into a single task
    val left = spark.range(10000).select(lit(1L).as("k"), col("id").as("t"),
      col("id").cast("string").as("name"))
    val right = spark.range(100).select(lit(1L).as("k"), (col("id") * 100).as("t"),
      concat(lit("q"), col("id")).as("v"))
    val salted = AsofJoin.asofJoinSalted(left, right, Seq("k"), "t", "t",
      Seq("v"), bucketWidth = 1000)
    // row-level LOCF window partitions on (k, __bucket): the hot key's
    // work splits into one unit per bucket (10 here), not one
    val windowSpecs = salted.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.sql).mkString(",")
    }
    assert(windowSpecs.exists(_.contains("__bucket")),
      s"row-level window must partition on the bucket: $windowSpecs")
    val hotKeyUnits = left.select((col("t") - pmod(col("t"), lit(1000L)))
      .divide(lit(1000L)).cast("long")).distinct().count()
    assert(hotKeyUnits == 10)
    // and the semantics still hold at the edges
    val got = salted.filter(col("t").isin(0L, 99L, 100L, 9999L))
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[String]("asof_v"))).toMap
    assert(got(0L) == "q0" && got(99L) == "q0" && got(100L) == "q1"
      && got(9999L) == "q99")
  }

  test("one shuffle: the plan has no range/cartesian join") {
    val left = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("t"))
    val right = spark.range(100).select(col("id").as("k"), (col("id") * 7).as("t"),
      col("id").as("v"))
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    assert(out.count() == 100)
  }
}
