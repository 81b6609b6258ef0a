package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the token-offset shard packing (t19): offsets are a
  * gapless cumulative layout, shard boundaries are exact multiples of the
  * budget, accounting conserves every token, and the assignment is
  * partitioning-invariant (a window over an explicit total order).
  */
class ShardPackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 100L

  private def corpus = Seq(
    // (stratum, id, tokens) — en crosses several boundaries incl. one
    // straddling doc (id 5: 70 tokens starting at offset 90)
    ("en", 1L, 40L), ("en", 2L, 50L), ("en", 3L, 0L), ("en", 4L, 0L),
    ("en", 5L, 70L), ("en", 6L, 100L), ("en", 7L, 1L),
    ("fr", 10L, 250L), ("fr", 11L, 10L))
    .toDF("lang", "doc_id", "tok_in")

  test("assign: start_off is the gapless running sum; shard = start/budget") {
    val got = ShardPacking
      .assign(corpus, "lang", "doc_id", col("tok_in"), budget)
      .select("lang", "doc_id", "start_off", "shard_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("en", 1L)) == (0L, 0L))
    assert(got(("en", 2L)) == (40L, 0L))
    assert(got(("en", 3L)) == (90L, 0L)) // empty doc sits at the boundary
    assert(got(("en", 5L)) == (90L, 0L)) // straddles 100: starts in shard 0
    assert(got(("en", 6L)) == (160L, 1L))
    assert(got(("en", 7L)) == (260L, 2L))
    assert(got(("fr", 10L)) == (0L, 0L)) // oversize doc: own shard span
    assert(got(("fr", 11L)) == (250L, 2L)) // shard 1 is fully inside doc 10
  }

  test("manifest: conserves docs and tokens; first/last respect doc order") {
    val m = ShardPacking
      .manifest(corpus, "lang", "doc_id", col("tok_in"), budget)
    val perLang = m.groupBy("lang")
      .agg(sum("n_docs").as("d"), sum("tok_sum").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perLang("en") == (7L, 261L))
    assert(perLang("fr") == (2L, 260L))
    val en0 = m.filter(col("lang") === "en" && col("shard_id") === 0).head()
    assert(en0.getAs[Long]("first_doc") == 1L)
    assert(en0.getAs[Long]("last_doc") == 5L)
  }

  test("assignment is invariant under input partitioning") {
    val a = ShardPacking
      .assign(corpus.repartition(7), "lang", "doc_id", col("tok_in"), budget)
      .select("lang", "doc_id", "shard_id").collect().toSet
    val b = ShardPacking
      .assign(corpus.coalesce(1), "lang", "doc_id", col("tok_in"), budget)
      .select("lang", "doc_id", "shard_id").collect().toSet
    assert(a == b)
  }

  test("writeShards: one directory per (stratum, shard), ONE file per shard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards")
    try {
      val path = s"$dir/shards"
      ShardPacking.writeShards(corpus.repartition(5), "lang", "doc_id",
        col("tok_in"), budget, path)
      val back = spark.read.parquet(path)
      assert(back.count() == 9L, "every doc lands in exactly one shard")
      // layout contract: a data loader reads shard k as ONE sequential file
      val filesPerShard = back
        .select(col("lang"), col("shard_id"), input_file_name().as("f"))
        .distinct()
        .groupBy(col("lang"), col("shard_id"))
        .agg(count(lit(1)).as("nf"))
        .collect().map(_.getLong(2))
      assert(filesPerShard.nonEmpty && filesPerShard.forall(_ == 1L),
        s"each shard must be one file, got ${filesPerShard.mkString(",")}")
      // read-back assignment ≡ in-memory assignment
      val fromStore = back.select(col("lang"), col("doc_id"),
        col("shard_id").cast("long")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val direct = ShardPacking
        .assign(corpus, "lang", "doc_id", col("tok_in"), budget)
        .select("lang", "doc_id", "shard_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(fromStore == direct)
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("non-positive budget is rejected") {
    intercept[IllegalArgumentException] {
      ShardPacking.assign(corpus, "lang", "doc_id", col("tok_in"), 0L)
    }
  }

  // --- skew-proof two-phase form -----------------------------------------

  /** One dominant stratum (en: 5000 of 5040 docs) with sparse, clumped,
    * negative-shifted doc ids — the shapes that stress the range cut.
    */
  private def skewed = {
    val en = (1 to 5000).map(i =>
      ("en", i.toLong * 7 - 3000, (i % 13).toLong + 1))
    val rest = (1 to 40).map(i => (s"l${i % 4}", i.toLong, (i % 5).toLong))
    (en ++ rest).toDF("lang", "doc_id", "tok_in")
  }

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select("lang", "doc_id", "start_off", "shard_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("assignBucketed ≡ assign bit-identically, for any bucket count") {
    val plain = key(ShardPacking.assign(skewed, "lang", "doc_id",
      col("tok_in"), 64L))
    for (b <- Seq(1, 8, 97, 1000000)) { // incl. degenerate 1 and > |stratum|
      val bucketed = key(ShardPacking.assignBucketed(skewed, "lang",
        "doc_id", col("tok_in"), 64L, b))
      assert(bucketed == plain, s"buckets=$b diverged from the plain form")
    }
    // the boundary-behavior corpus too (empty docs, straddlers, oversize)
    assert(key(ShardPacking.assignBucketed(corpus, "lang", "doc_id",
      col("tok_in"), budget, 3)) ==
      key(ShardPacking.assign(corpus, "lang", "doc_id", col("tok_in"), budget)))
  }

  test("assignBucketed splits the dominant stratum into >1 window unit") {
    val out = ShardPacking.assignBucketed(skewed, "lang", "doc_id",
      col("tok_in"), 64L, 8)
    // plan pin: the heavy cumsum window partitions on (stratum, __bkt),
    // and the base-offset window exists alongside it partitioned on the
    // stratum alone (bounded by the bucket count, not the corpus)
    val windowSpecs = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.sql).mkString(",")
    }
    assert(windowSpecs.exists(_.contains("__bkt")),
      s"row-level cumsum must partition on the bucket: $windowSpecs")
    // data pin: replay the operator's own range cut — en really occupies
    // >1 bucket, so its cumsum runs as >1 parallel unit
    val units = skewed.filter(col("lang") === "en")
      .select(expr(
        "(doc_id - min(doc_id) over ()) div " +
          "((max(doc_id) over () - min(doc_id) over ()) div 8 + 1)"))
      .distinct().count()
    assert(units > 1, "dominant stratum must span multiple buckets")
  }

  test("assignBucketed is invariant under input partitioning; rejects non-numeric order") {
    val a = key(ShardPacking.assignBucketed(skewed.repartition(11), "lang",
      "doc_id", col("tok_in"), 64L, 8))
    val b = key(ShardPacking.assignBucketed(skewed.coalesce(1), "lang",
      "doc_id", col("tok_in"), 64L, 8))
    assert(a == b)
    val strKey = skewed.withColumn("sid", col("doc_id").cast("string"))
    val e = intercept[IllegalArgumentException] {
      ShardPacking.assignBucketed(strKey, "lang", "sid", col("tok_in"), 64L, 8)
    }
    assert(e.getMessage.contains("numeric order column"), e.getMessage)
  }

  test("writeShards routes through the bucketed window — executed-plan pin") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = plans.add(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards-bkt")
    try {
      val path = s"$dir/shards"
      ShardPacking.writeShards(skewed, "lang", "doc_id", col("tok_in"), 64L,
        path, buckets = 8)
      org.apache.spark.sql.GraftSqlBridge.waitListenerBusEmpty(spark)
      // plan pin on the WRITE's own captured execution (not a reconstructed
      // frame): the heavy cumsum window partitions on (stratum, __bkt), so
      // the dominant stratum runs as >1 window unit in the layout job
      import scala.jdk.CollectionConverters._
      val windowSpecs = plans.asScala.toSeq.flatMap(_.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec.map(_.sql).mkString(",")
      })
      assert(windowSpecs.nonEmpty, "listener captured no write execution")
      assert(windowSpecs.exists(_.contains("__bkt")),
        s"write plan must run the cumsum per (stratum, bucket): $windowSpecs")
      // and the materialized layout still equals the single-window form
      val back = spark.read.parquet(path)
        .select(col("lang"), col("doc_id"), col("shard_id").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val direct = ShardPacking
        .assign(skewed, "lang", "doc_id", col("tok_in"), 64L)
        .select("lang", "doc_id", "shard_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(back == direct)
    } finally {
      spark.listenerManager.unregister(l)
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("writeShards falls back to the single window for non-numeric order keys") {
    val strKey = corpus.withColumn("sid", concat(lit("d"),
      lpad(col("doc_id").cast("string"), 4, "0"))) // zero-padded: string order ≡ numeric
    val dir = java.nio.file.Files.createTempDirectory("graft-shards-str")
    try {
      val path = s"$dir/shards"
      ShardPacking.writeShards(strKey, "lang", "sid", col("tok_in"), budget,
        path)
      val back = spark.read.parquet(path)
        .select(col("lang"), col("doc_id"), col("shard_id").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val direct = ShardPacking
        .assign(corpus, "lang", "doc_id", col("tok_in"), budget)
        .select("lang", "doc_id", "shard_id").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(back == direct)
    } finally {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir))(
        _.iterator().asScala.toSeq).reverse.foreach(java.nio.file.Files.delete)
    }
  }

  test("manifestBucketed ≡ manifest on the skewed corpus") {
    def m(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(
      m(ShardPacking.manifestBucketed(skewed, "lang", "doc_id",
        col("tok_in"), 64L, 8)) ==
      m(ShardPacking.manifest(skewed, "lang", "doc_id", col("tok_in"), 64L)))
  }

  test("sequencePack: hand-checked window coordinates and crossing census") {
    import spark.implicits._
    // stream a (L=10): 7 → [0,6] fits; 5 → [7,11] crosses once;
    // 9 → [12,20] crosses once; 25 → [21,45] crosses 0-token doc's
    // position... doc 4 has 0 tokens at offset 21 (no crossing by
    // contract); doc 5: 25 → [21,45] spans windows 2,3,4 → 2 crossings.
    val docs = Seq(
      ("a", 1L, 7L), ("a", 2L, 5L), ("a", 3L, 9L),
      ("a", 4L, 0L), ("a", 5L, 25L),
      ("b", 10L, 10L) // exactly one full window: [0,9], 0 crossings
    ).toDF("lang", "doc_id", "tok_in")
    val out = ShardPacking.sequencePack(docs, "lang", "doc_id",
        col("tok_in"), 10L, 4)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("start_off"), r.getAs[Long]("seq_idx"),
        r.getAs[Long]("seq_off"), r.getAs[Long]("crossings"))).toSeq
    assert(out == Seq(
      ("a", 1L, 0L, 0L, 0L, 0L),
      ("a", 2L, 7L, 0L, 7L, 1L),
      ("a", 3L, 12L, 1L, 2L, 1L),
      ("a", 4L, 21L, 2L, 1L, 0L),
      ("a", 5L, 21L, 2L, 1L, 2L),
      ("b", 10L, 0L, 0L, 0L, 0L)))
    // partition independence (the t41 bucketed axis underneath)
    val re = ShardPacking.sequencePack(docs.repartition(5), "lang",
        "doc_id", col("tok_in"), 10L, 4)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("crossings"))).toSeq
    assert(re == out.map(t => (t._2, t._6)))
  }
}
