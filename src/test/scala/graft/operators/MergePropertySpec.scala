package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized (seeded) merge invariants over many generated existing/
  * incoming splits — the algebra the anti-join merge must satisfy for ANY
  * input, not just the scenario fixtures.
  */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val pk = Seq("invoice_number", "reference_number")
  private val rnd = new scala.util.Random(20260812)

  private def randomFrame(n: Int, keySpace: Int) = {
    val rows = (1 to n).map { i =>
      val k = rnd.nextInt(keySpace)
      (s"F$k", s"R${k % 7}", s"carrier-${rnd.nextInt(5)}", i.toLong)
    }
    rows.toDF("invoice_number", "reference_number", "carrier_name", "row_index")
  }

  test("insert-only invariants hold across random inputs") {
    (1 to 5).foreach { trial =>
      val existing = randomFrame(rnd.nextInt(80), 40).dropDuplicates(pk)
      val incoming = randomFrame(rnd.nextInt(80) + 1, 40)
      val m = Merge.insertOnly(existing, incoming, pk)
      val result = m.result.cache()

      // 1. result PK set = existing ∪ incoming PK sets; result PKs unique
      val exK = existing.select(pk.map(col): _*).distinct().count()
      val unionK = existing.select(pk.map(col): _*)
        .unionByName(incoming.select(pk.map(col): _*)).distinct().count()
      assert(result.count() == unionK, s"trial $trial: union cardinality")
      assert(result.select(pk.map(col): _*).distinct().count() == unionK,
        s"trial $trial: PK uniqueness")

      // 2. inserted = result − existing (by PK), and inserted ⊆ incoming
      assert(m.inserted.count() == unionK - exK, s"trial $trial: inserted count")
      assert(m.inserted.join(incoming, pk, "left_anti").count() == 0,
        s"trial $trial: inserted from incoming")

      // 3. existing rows survive UNCHANGED (values, not just keys)
      val survived = result.join(existing, pk, "left_semi")
      val diff = survived.select("invoice_number", "reference_number", "carrier_name")
        .exceptAll(existing.select("invoice_number", "reference_number", "carrier_name"))
      assert(diff.count() == 0, s"trial $trial: existing rows mutated")

      // 4. idempotence: merging the same incoming again inserts nothing
      val again = Merge.insertOnly(result.drop("status"), incoming, pk)
      assert(again.inserted.count() == 0, s"trial $trial: idempotence")
      result.unpersist()
    }
  }

  test("full-upsert invariants hold across random inputs") {
    (1 to 5).foreach { trial =>
      val existing = randomFrame(rnd.nextInt(60), 30).dropDuplicates(pk)
      val incoming = randomFrame(rnd.nextInt(60) + 1, 30)
      val m = Merge.fullUpsert(existing, incoming, pk, Seq("carrier_name"))
      val result = m.result.cache()

      val unionK = existing.select(pk.map(col): _*)
        .unionByName(incoming.select(pk.map(col): _*)).distinct().count()
      assert(result.count() == unionK, s"trial $trial: upsert cardinality")

      // incoming wins: every deduped-incoming PK's carrier appears verbatim
      val dedupIn = Merge.dedupFirstWins(incoming, pk, Some("row_index"))
      val mismatch = dedupIn.select(col("invoice_number"), col("reference_number"),
          col("carrier_name").as("want"))
        .join(result, pk)
        .filter(col("carrier_name") =!= col("want"))
      assert(mismatch.count() == 0, s"trial $trial: incoming wins")
      result.unpersist()
    }
  }
}
