package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalization column-functions: the reference's type-coercion layer
  * re-expressed as pure Catalyst expressions (no UDFs — everything stays
  * inside whole-stage codegen and survives predicate pushdown).
  *
  * Semantics derive from the reference (read-only at /root/reference):
  *  - multi-format date parse        (transform.py:141-166)
  *  - quarter-label derivation       (transform.py:31-57)
  *  - safe decimal coercion + the millions-scaling heuristic
  *                                   (transform.py:168-186, config.py:89-97)
  *  - EPS estimation from net income (transform.py:188-201)
  *  - Python-truthiness key coalesce (transform.py:82)
  *
  * All functions are ANSI-mode safe (Spark 4 default): parse/cast failures
  * yield null via `try_*`, never a task failure — mirroring the reference's
  * row-level tolerance (transform.py:98-100).
  */
object Normalize {

  /** Multi-format lenient date parse (reference transform.py:141-166).
    * Tries `yyyy-MM-dd`, `yyyy-MM-dd HH:mm:ss`, `MM/dd/yyyy`, then the
    * bare-year rule (int/float year -> Dec 31 of that year); anything else
    * is null. Pure built-ins; each `try_to_date` is codegen'd.
    *
    * Each format is guarded by a shape regex BEFORE the parse: a
    * `coalesce(try_to_date x3)` chain makes every non-matching format
    * throw-and-swallow inside the parser per row (measured ~85 us/row —
    * 25x slower than a plain scan); with the rlike dispatch exactly one
    * parse runs per row and the hot path is exception-free. A string can
    * match at most one shape, so dispatch order cannot change results.
    */
  def parseDateMulti(c: Column): Column = {
    val s = c.cast(StringType)
    when(s.rlike("^\\d{4}-\\d{2}-\\d{2}$"), try_to_date(s, "yyyy-MM-dd"))
      .when(s.rlike("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$"),
        try_to_date(s, "yyyy-MM-dd HH:mm:ss"))
      .when(s.rlike("^\\d{2}/\\d{2}/\\d{4}$"), try_to_date(s, "MM/dd/yyyy"))
      .when(s.rlike("^\\d{4}(\\.0+)?$"),
        make_date(s.cast(DoubleType).cast(IntegerType), lit(12), lit(31)))
  }

  /** The LABEL path's 4-format variant (reference transform.py:36-49,
    * `standardize_quarter_date`): like [[parseDateMulti]] but with a
    * day-first `dd/MM/yyyy` fallback after month-first fails (so
    * `13/01/2020` parses as Jan 13), and NO bare-year rule (the label
    * path rejects non-strings). Only strings the month-first parse
    * rejects pay the second parse.
    */
  def parseDateLabelPath(c: Column): Column = {
    val s = c.cast(StringType)
    when(s.rlike("^\\d{4}-\\d{2}-\\d{2}$"), try_to_date(s, "yyyy-MM-dd"))
      .when(s.rlike("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$"),
        try_to_date(s, "yyyy-MM-dd HH:mm:ss"))
      .when(s.rlike("^\\d{2}/\\d{2}/\\d{4}$"),
        coalesce(try_to_date(s, "MM/dd/yyyy"), try_to_date(s, "dd/MM/yyyy")))
  }

  /** `"YYYY-QN"` quarter label (reference transform.py:51-53; month->quarter
    * mapping is exactly Spark's `quarter()`). Null date -> null label.
    */
  def quarterLabel(d: Column): Column =
    concat(year(d).cast(StringType), lit("-Q"), quarter(d).cast(StringType))

  /** Strings treated as missing after cleanup (reference transform.py:175-178). */
  private val MissingTokens = Seq("", "N/A", "n/a", "-")

  /** Safe decimal coercion (reference transform.py:168-186): strip
    * `[,$%\s]`, map sentinel strings to null, cast (invalid -> null via
    * try_cast), then the millions heuristic: `0 < v < 1e6  =>  v * 1e6`.
    *
    * The parse happens at `scale+6` fractional digits and quantizes to
    * `(precision, scale)` only AFTER the heuristic — the reference parses
    * into an unbounded Decimal and quantizes at the DB sink, so a
    * sub-cent `0.000001` must scale to `1.00`, not quantize to `0.00`
    * first (reference test_edge_cases.py:188-205). Values above
    * 10^(precision-scale) overflow to null under the default bound; pass
    * `precision = 38` for the unbounded-like range.
    */
  def safeDecimal(c: Column, precision: Int = 15, scale: Int = 2): Column = {
    val cleaned = regexp_replace(c.cast(StringType), "[,$%\\s]", "")
    val nulled  = when(cleaned.isin(MissingTokens: _*), lit(null)).otherwise(cleaned)
    // Extra fractional digits only as far as precision can actually grow:
    // at precision 38 the wide parse degrades to the plain cast rather
    // than silently narrowing the integer range (38,8 has six fewer
    // integer digits than 38,2 — the "unbounded-like" escape hatch must
    // keep its full magnitude).
    val wideP   = math.min(precision + 6, 38)
    val wide    = DecimalType(wideP, scale + (wideP - precision))
    val v       = nulled.try_cast(wide)
    val scaled  = when(v > 0 && v < 1000000L, v * 1000000L).otherwise(v)
    scaled.try_cast(DecimalType(precision, scale))
  }

  /** The Pydantic validator's *second* millions heuristic
    * (reference config.py:89-97): scales ANY value `< 1e6` — including
    * negatives — by 1e6. Applied after [[safeDecimal]] only to
    * revenue/gross_profit fields; the composition is the canonical
    * semantics (SURVEY.md §7.5.1).
    */
  def millionsValidator(v: Column, precision: Int = 15, scale: Int = 2): Column =
    when(v.isNotNull && v < 1000000L, v * 1000000L)
      .otherwise(v)
      .try_cast(DecimalType(precision, scale))

  /** EPS estimation (reference transform.py:188-201):
    * `eps = (net_income/1e6)/shares if net_income >= 1e6 else net_income/shares`,
    * rounded to 4 places. `shares` comes from the share-count lookup
    * ([[sharesFor]]). Double math; final exact DECIMAL(10,4).
    */
  def estimateEps(netIncome: Column, shares: Column): Column = {
    val ni  = netIncome.cast(DoubleType)
    val adj = when(ni >= 1000000d, ni / 1000000d).otherwise(ni)
    round(adj / shares.cast(DoubleType), 4).try_cast(DecimalType(10, 4))
  }

  /** Share-count lookup with default (reference transform.py:193-194:
    * {TSLA:3160, RIVN:920, LCID:1600, else 1000}). Takes the literal map as
    * pairs so test-table analogs can rebind keys. Broadcast-free: a literal
    * map beats a join for a 3-entry dim.
    */
  def sharesFor(key: Column, shares: Map[String, Int], default: Int = 1000): Column = {
    val m = map(shares.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, key), lit(default))
  }

  /** Company-name lookup with a SYNTHESIZED default (reference
    * load.py:55-69: `company_names.get(ticker, f'{ticker} Inc')`) — the
    * default is derived from the key, not a constant.
    */
  def nameFor(ticker: Column, names: Map[String, String]): Column = {
    val m = map(names.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, ticker), concat(ticker, lit(" Inc")))
  }

  /** Python-truthiness key coalesce (reference transform.py:82:
    * `record.get('eps') or record.get('netIncomePerShare')` — `or` skips
    * null, empty string AND zero). Faithful form; see [[coalesceKey]] for
    * the null-only variant (decision documented in SURVEY.md §7.5.2).
    * The zero test goes through `try_cast` so string-typed inputs never
    * raise under ANSI mode: a non-numeric string is truthy (kept).
    */
  def coalesceKeyTruthy(a: Column, b: Column): Column = {
    val falsy = a.isNull || a.cast(StringType) === "" ||
      coalesce(a.try_cast(DoubleType) === 0, lit(false))
    when(falsy, b).otherwise(a)
  }

  /** Null-only coalesce — the cleaner semantics the engine defaults to. */
  def coalesceKey(a: Column, b: Column): Column = coalesce(a, b)
}
