package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("hash sample: deterministic, partition-independent, near the target fraction") {
    val a = Sampling.hashSample(docs, "doc_id", 300000L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 300000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample must not depend on partitioning")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"0.3 target, got $frac")
    // a different salt draws an independent sample
    val c = Sampling.hashSample(docs, "doc_id", 300000L, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != a)
    // nested fractions: a 10% sample is a subset of the 30% sample
    val d = Sampling.hashSample(docs, "doc_id", 100000L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(d.subsetOf(a), "smaller fraction must nest inside larger")
  }

  test("stratified quota: exactly min(quota, |stratum|) per stratum, deterministic") {
    val out = Sampling.stratifiedQuota(docs, "lang", "doc_id", 25)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (lang, n) =>
      assert(perLang(lang) == math.min(25L, n), s"$lang: ${perLang(lang)} of $n")
    }
    val again = Sampling.stratifiedQuota(docs.repartition(5), "lang", "doc_id", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("uniform ppm stays in range and spreads") {
    val u = Seq.tabulate(1000)(i => i.toLong).toDF("k")
      .select(Sampling.hashUniformPpm(col("k"), "s").as("u"))
      .as[Long].collect()
    assert(u.forall(x => x >= 0 && x < 1000000))
    assert(u.distinct.length > 950, "uniforms must spread (few collisions)")
  }
}
