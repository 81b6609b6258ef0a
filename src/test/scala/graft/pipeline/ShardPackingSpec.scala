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
}
