package graft

import org.apache.spark.sql.types.DecimalType

/** CI guard for the output-boundary decimal rule (see QueryDef.noDecimals):
  * no driver-checked query may expose DECIMAL in its final schema — the
  * driver's pyarrow read renders decimals scale-preserving ('123.40') while
  * the DuckDB oracle lands in float64 ('123.4'), so any trailing-zero cent
  * would hash-mismatch. Schema-only check: builds every plan, executes none.
  */
class OutputBoundarySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("no query output schema contains DecimalType") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val decCols = fn(spark, sfDir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] => f.name
        }
        if (decCols.isEmpty) None else Some(s"$name: ${decCols.mkString(",")}")
    }
    assert(offenders.isEmpty, s"DECIMAL at output boundary: $offenders")
  }

  test("entry flagship output is decimal-free too") {
    val dec = graft.queries.QueryDef.noDecimals(SparkEntry.entry(spark))
      .schema.fields.filter(_.dataType.isInstanceOf[DecimalType])
    assert(dec.isEmpty)
  }
}
