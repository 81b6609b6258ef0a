package graft.functions

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Golden vectors for the locale-aware money parser, mirroring the
  * reference's unit suite (smartbots-etl/tests/unit/test_transformers.py:16-46),
  * exercised through BOTH the interpreted helper and the codegen'd Catalyst
  * expression path.
  */
class MoneyParseSpec extends SparkSpec {

  private def bd(s: String) = new JBD(s).setScale(2)

  private val vectors: Seq[(String, JBD)] = Seq(
    "1.234.567" -> bd("1234567"),   // Chilean thousands, multiple dots
    "$12.345" -> bd("12345"),       // $ + single dot with 3 trailing digits
    "12.345" -> bd("12345"),        // Chilean thousands, single dot
    "1234,56" -> bd("1234.56"),     // decimal comma
    "1,234.56" -> bd("1234.56"),    // US thousands + decimal dot
    "1.234,56" -> bd("1234.56"),    // Chilean thousands + decimal comma
    "1234.56" -> bd("1234.56"),     // plain decimal (2 trailing digits)
    "12.3456" -> bd("12.35"),       // single dot, 4 trailing → decimal, rounded
    "$ 1.234,5" -> bd("1234.50"),   // dollar+space, 1 trailing decimal digit
    "0" -> bd("0"),
    "123" -> bd("123"),
    "-1.234,56" -> bd("-1234.56")
  )

  private val invalid = Seq("N/A", "", "   ", "abc", "12a34", null)

  test("F3 golden vectors — interpreted helper") {
    vectors.foreach { case (in, want) =>
      val got = MoneyParse.parseJava(in)
      assert(got != null && got.compareTo(want) == 0, s"parse('$in') = $got, want $want")
    }
    invalid.foreach { in =>
      assert(MoneyParse.parseJava(in) == null, s"parse('$in') should be null")
    }
  }

  test("F3 golden vectors — Catalyst expression (codegen path)") {
    import spark.implicits._
    val df = (vectors.map(_._1) ++ invalid.filter(_ != null)).toDF("raw")
      .select(col("raw"), parse_clp_money(col("raw")).as("m"))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
    vectors.foreach { case (in, want) =>
      assert(got(in).exists(_.compareTo(want) == 0), s"expr('$in') = ${got(in)}, want $want")
    }
    invalid.filter(_ != null).foreach { in =>
      assert(got(in).isEmpty, s"expr('$in') should be null")
    }
  }

  test("F3 property — Chilean and US renderings of the same value agree") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val cents = rnd.nextLong(999999999L)
      val v = new JBD(cents).movePointLeft(2).setScale(2)
      val plain = v.toPlainString // e.g. 1234567.89
      val Array(ip, fp) = plain.split("\\.")
      val grouped = ip.reverse.grouped(3).mkString(",").reverse
      val us = s"$grouped.$fp"
      val cl = us.replace(",", "#").replace(".", ",").replace("#", ".")
      assert(MoneyParse.parseJava(us).compareTo(v) == 0, s"US '$us'")
      assert(MoneyParse.parseJava(cl).compareTo(v) == 0, s"CL '$cl'")
    }
  }

  test("F3 — overflow beyond Decimal(18,2) is null, not an exception") {
    assert(MoneyParse.parseJava("99999999999999999") == null)
    assert(MoneyParse.parseJava("9999999999999999") != null)
  }
}
