package graft

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.domain.InvoiceRecord

/** Scalar function layer — SURVEY.md §2.3 (F1–F10). Everything except the
  * money parser composes from codegen'd Spark built-ins; the money parser is
  * a custom Catalyst expression ([[graft.functions.ParseClpMoney]]).
  */
package object functions {

  /** F3 — locale-aware money parse → DecimalType(18,2), null when invalid
    * (reference: smartbots-etl/src/application/transformers.py:70-101).
    */
  def parse_clp_money(c: Column): Column =
    GraftSqlBridge.column(ParseClpMoney(GraftSqlBridge.expression(c.cast("string"))))

  /** Codegen'd integer dot product of two `array<long>` columns (see
    * [[graft.functions.LongArrayDot]]) — the similarity layer's hot loop.
    */
  def long_array_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(LongArrayDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd ×1000 HALF_UP embedding quantization (see
    * [[graft.functions.LongArrayQuantize]]) — replaces the interpreted
    * `transform(v, x => round(x*1000))` HOF in the similarity layer.
    */
  def long_array_quantize(v: Column): Column =
    GraftSqlBridge.column(LongArrayQuantize(GraftSqlBridge.expression(v)))

  /** Codegen'd `nprobe`-nearest-centroid selection (see
    * [[graft.functions.NearestCentroids]]) — the centroid matrix rides
    * the expression as data, so cost is one fused loop instead of an
    * O(k·dims)-node literal tree.
    */
  def nearest_centroids(qv: Column, centroids: Seq[(Int, Seq[Long])],
      dims: Int, nprobe: Int): Column =
    GraftSqlBridge.column(NearestCentroids(
      GraftSqlBridge.expression(qv),
      centroids.map(_._1).toArray,
      centroids.flatMap { case (_, cv) =>
        cv.padTo(dims, 0L).take(dims) }.toArray,
      dims, nprobe))

  /** Codegen'd banded sign-bucket computation (see
    * [[graft.functions.BandSignBuckets]]) — one int bucket per band
    * from a fused primitive loop over the ±1 hyperplane matrix,
    * replacing the interpreted bands×bits literal-dot column pile.
    * `rows` is the [[graft.similarity.Similarity.rademacherMatrix]]
    * layout: row `t·bitsPerBand + j` is band t's bit-j hyperplane.
    */
  def band_sign_buckets(qv: Column, rows: Array[Array[Long]],
      bands: Int, bitsPerBand: Int): Column = {
    val dims = if (rows.isEmpty) 0 else rows(0).length
    GraftSqlBridge.column(BandSignBuckets(
      GraftSqlBridge.expression(qv),
      rows.flatten, bands, bitsPerBand, dims))
  }

  /** Codegen'd exact cosine-threshold gate `dot > 0 && dot²·10¹² ≥
    * n1·n2·ppm²` (see [[graft.functions.CosineGatePpm]]) — replaces the
    * four-decimal-multiply-per-pair `decimal(38,0)` widening in the
    * near-pair confirm filters.
    */
  def cosine_gate_ppm(dot: Column, n1: Column, n2: Column,
      ppm: Long): Column =
    GraftSqlBridge.column(CosineGatePpm(
      GraftSqlBridge.expression(dot), GraftSqlBridge.expression(n1),
      GraftSqlBridge.expression(n2),
      GraftSqlBridge.expression(lit(ppm))))

  /** Codegen'd polynomial rolling hash over code points (see
    * [[graft.functions.RollingHash]]); empty/null → null.
    */
  def rolling_hash(c: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c.cast("string"))))

  /** Codegen'd one-pass character-class census — `struct<n_letters,
    * n_digits, n_punct>` (see [[graft.functions.CharClassCounts]]).
    */
  def char_class_counts(c: Column): Column =
    GraftSqlBridge.column(CharClassCounts(GraftSqlBridge.expression(c.cast("string"))))

  /** Z-order (Morton) key: bit-interleave the low `bits` bits of two
    * non-negative dimension values — result bit 2i is a's bit i, bit
    * 2i+1 is b's bit i. Range-partitioning a table by this key clusters
    * rows that are close in BOTH dimensions into the same files, so
    * per-file min/max statistics prune scans for predicates on EITHER
    * dimension — the multi-dimensional data-skipping layout lever
    * (linear/single-key clustering only prunes its leading key). Pure
    * composed bit arithmetic: whole-stage codegen folds the 2·bits
    * shift-mask-or terms into one fused loop-free expression, and the
    * identical arithmetic is emitted for the DuckDB oracle by
    * [[zorder_key_sql]]. Callers bucket each dimension into [0, 2^bits)
    * first (e.g. `pmod(hash, 1 << bits)` or a range bin).
    */
  def zorder_key(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    zorder_key_n(Seq(a, b), bits)
  }

  /** N-dimensional Morton key: result bit `i·d + j` is dimension j's bit
    * i — the round-robin interleave that generalizes [[zorder_key]] (the
    * 2-D case is bit-identical). `d·bits` must fit a non-negative long
    * (≤ 63). Three and four dimension clustering is the common case for
    * fact-table stores filtered on (date, customer, region)-style
    * predicate mixes; per-dimension resolution drops as dims are added
    * (fixed key width), which is the standard z-order trade.
    */
  def zorder_key_n(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, s"need ≥ 2 dimensions, got ${dims.size}")
    require(bits >= 1 && dims.size * bits <= 63,
      s"${dims.size} dims × $bits bits must be in [1,63]")
    val d = dims.size
    val terms = (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftrightunsigned(c.cast("long"), i).bitwiseAND(1L),
          i * d + j)
      }
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB SQL emitting the identical z-order arithmetic over two SQL
    * expressions — kept beside [[zorder_key]] so the two dialects can
    * never drift.
    */
  def zorder_key_sql(a: String, b: String, bits: Int): String =
    zorder_key_n_sql(Seq(a, b), bits)

  /** DuckDB SQL for [[zorder_key_n]] — same round-robin interleave. */
  def zorder_key_n_sql(dims: Seq[String], bits: Int): String = {
    require(dims.size >= 2, s"need ≥ 2 dimensions, got ${dims.size}")
    require(bits >= 1 && dims.size * bits <= 63,
      s"${dims.size} dims × $bits bits must be in [1,63]")
    val d = dims.size
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (c, j) =>
        s"(((CAST(($c) AS BIGINT) >> $i) & 1) << ${i * d + j})"
      }
    }.mkString("(", " | ", ")")
  }

  /** F1 — `_clean_string`: null → "", else trimmed string rendering
    * (transformers.py:51-55).
    */
  def clean_string(c: Column): Column =
    coalesce(trim(c.cast("string")), lit(""))

  /** F2 — currency normalize: clean + upper-case; the "CLP" default applies
    * at the mapping layer when the column is absent (transformers.py:31).
    */
  def norm_currency(c: Column): Column = upper(clean_string(c))

  /** F4 + F5 — multi-format date parse. Tries the configured primary format
    * then the reference's fallback chain (transformers.py:57-68 plus the
    * extractor's extra formats at official_format_extractor.py:499-525),
    * then the Excel 1900-epoch serial fallback (calamine_extractor.py:122-128).
    * Null when nothing matches — errors are data.
    */
  def parse_multi_date(c: Column, primaryFormat: String = "dd-MM-yyyy"): Column = {
    val s = trim(c.cast("string"))
    val formats =
      Seq(primaryFormat, "yyyy-MM-dd", "dd/MM/yyyy", "dd-MM-yyyy",
        "dd-MM-yy", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss").distinct
    // Shape-DISPATCH, not try-chain: a bare coalesce(try_to_date(f1),
    // try_to_date(f2), …) is exception-driven — every format miss throws
    // and catches a DateTimeParseException inside the formatter, so a
    // corpus whose values mostly match late/no formats pays millions of
    // throws plus JIT deopt churn (measured at sf1: 6M rows, ~15M
    // exceptions, 46–120 s and run-to-run erratic; with the guards:
    // ~4 s steady). Each format gets a cheap codegen'd regex guard
    // derived from its pattern; the formatter only runs on values whose
    // SHAPE already matches, so valid data parses exception-free and
    // shape-matching-but-invalid values (e.g. "45-06-2024") still
    // return null through try_to_date exactly like the old chain.
    val parsed = formats.map { f =>
      val shape = formatShape(f)
      // a pattern token the shape map doesn't know (single-letter d/M,
      // MMM, …) would leave raw letters in the regex and the guard would
      // NEVER match — silently disabling the format. Guard only formats
      // that translated fully; anything else keeps the plain try parse.
      val residue = shape.replace("""\d{4}""", "").replace("""\d{2}""", "")
      val fullyTranslated = !residue.exists(ch => ch.isLetter && ch != 'T')
      if (fullyTranslated) when(s.rlike(shape), try_to_date(s, f))
      else try_to_date(s, f)
    }
    coalesce(parsed :+ excel_serial_date(s): _*)
  }

  /** Anchored digit-shape regex for a date format pattern — the dispatch
    * guard for [[parse_multi_date]]. Longer tokens first (`yyyy` before
    * `yy`) so replacement is unambiguous.
    */
  private[graft] def formatShape(f: String): String =
    "^" + f.replace("'T'", "T")
      .replace("yyyy", """\d{4}""").replace("yy", """\d{2}""")
      .replace("dd", """\d{2}""").replace("MM", """\d{2}""")
      .replace("HH", """\d{2}""").replace("mm", """\d{2}""")
      .replace("ss", """\d{2}""")
      .replace("/", "\\/") + "$"

  /** F5 — Excel serial day-number → date (1900 epoch with the classic
    * -2 day leap-bug correction, i.e. epoch 1899-12-30).
    */
  def excel_serial_date(c: Column): Column =
    date_add(lit(java.sql.Date.valueOf("1899-12-30")),
      when(c.cast("string").rlike("^[0-9]{1,7}$"), c.cast("int")))

  /** F6 — strip the literal "Aprobado por: " prefix, then trim
    * (official_format_extractor.py:31-36).
    */
  def strip_aprobado_prefix(c: Column): Column =
    trim(regexp_replace(clean_string(c), "^Aprobado por: ", ""))

  /** F7 — row total with explicit-total override: use `Total Servicio ($)`
    * when > 0, else the sum of the 7 charge components with nulls as 0
    * (official_format_extractor.py:478-494).
    */
  def row_total_override(totalServicio: Column, components: Seq[Column]): Column = {
    val summed = components
      .map(c => coalesce(c.cast(InvoiceRecord.money), lit(0).cast(InvoiceRecord.money)))
      .reduce(_ + _)
    when(coalesce(totalServicio, lit(0)) > 0, totalServicio.cast(InvoiceRecord.money))
      .otherwise(summed)
      .cast(InvoiceRecord.money)
  }

  /** F9 — best-effort integral rendering of invoice numbers on egress
    * (excel_handler.py:98-102): numeric → long, else passthrough string.
    */
  def invoice_number_as_int(c: Column): Column = {
    val asDouble = c.cast("string").try_cast("double")
    when(asDouble.isNotNull, asDouble.cast("long").cast("string"))
      .otherwise(c.cast("string"))
  }

  /** F10 — money cross-check: |total - (net + tax)| <= 1 peso tolerance
    * (entities.py:66-71; boundary: variance 1 passes, 2 fails).
    */
  def money_cross_check_ok(total: Column, net: Column, tax: Column): Column =
    abs(total - (net + tax)) <= lit(1)
}
