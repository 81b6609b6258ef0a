package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

/** One driver-checkable query: a Spark implementation over the test tables
  * in `sfDir`, plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names and explicit output types must match between the two — the
  * driver sorts columns by name and hash-compares values.
  *
  * Output-boundary rule (round-1 lesson): a query's FINAL schema must never
  * contain DECIMAL. The driver reads the Spark result via pyarrow (decimals
  * render scale-preserving, `'123.40'`) but the DuckDB oracle lands in
  * float64 (`'123.4'`), so any trailing-zero cent hash-mismatches. All
  * internal arithmetic stays DECIMAL (exact); [[QueryDef.noDecimals]] casts
  * the money columns to DOUBLE at the boundary — lossless for exact cents
  * below 2^53, and bit-identical on both engines because each does one
  * correctly-rounded conversion of the same exact decimal value. Oracle SQL
  * mirrors this with `CAST(... AS DOUBLE)` on the same columns.
  */
final case class QueryDef(
    name: String,
    raw: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {

  /** The raw plan with the output-boundary decimal→double cast applied —
    * this is what Verify/Bench run and the driver checks.
    */
  def fn: (SparkSession, String) => DataFrame =
    (s, dir) => QueryDef.noDecimals(raw(s, dir))
}

object QueryDef {

  /** Casts every top-level DecimalType column to DOUBLE, preserving column
    * order and (being a bare projection) row order. No-op when the schema
    * is already decimal-free.
    */
  def noDecimals(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.dataType.isInstanceOf[DecimalType])) df
    else df.select(df.schema.fields.map { f =>
      val c: Column = col("`" + f.name + "`")
      f.dataType match {
        case _: DecimalType => c.cast("double").as(f.name)
        case _              => c
      }
    }.toIndexedSeq: _*)
}

object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
