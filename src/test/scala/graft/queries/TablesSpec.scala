package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

/** Footer-metadata row counts ([[Tables.rowCount]]) must agree with a full
  * Spark count on every layout the loader accepts: a single parquet file,
  * a flat multi-part directory, and a partitionBy (nested-subdirectory)
  * layout. Builders size ANN blocking parameters from this — a silent
  * undercount would shrink bucket bits / centroid counts instead of
  * failing, so wrong layouts must throw.
  */
class TablesSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft-tables").toString

  test("rowCount == count() for single-file and multi-part layouts") {
    import spark.implicits._
    val base = tmpDir()
    val df = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "k")

    // directory of part files (the standard Spark write)
    df.repartition(4).write.mode(SaveMode.Overwrite)
      .parquet(s"$base/multi.parquet")
    assert(Tables.rowCount(spark, base, "multi") == 1000L)
    assert(Tables.load(spark, base, "multi").count() == 1000L)

    // bare single file (the driver's testdata layout): move one part up
    val single = s"$base/single.parquet"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$base/__tmp")
    val part = new java.io.File(s"$base/__tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(single))
    assert(Tables.rowCount(spark, base, "single") == 1000L)
  }

  test("rowCount recurses into partitionBy subdirectories") {
    import spark.implicits._
    val base = tmpDir()
    (1 to 500).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .write.partitionBy("p").mode(SaveMode.Overwrite)
      .parquet(s"$base/parted.parquet")
    assert(Tables.rowCount(spark, base, "parted") == 500L)
  }

  test("rowCount fails loud on a directory with no parquet parts") {
    val base = tmpDir()
    Files.createDirectories(java.nio.file.Paths.get(s"$base/empty.parquet"))
    Files.writeString(
      java.nio.file.Paths.get(s"$base/empty.parquet/data.orc"), "not parquet")
    val ex = intercept[IllegalArgumentException] {
      Tables.rowCount(spark, base, "empty")
    }
    assert(ex.getMessage.contains("no .parquet part files"))
  }
}
