package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality operators: validation predicates, golden-row tolerance
  * checks, and the uniqueness assertion Spark must own because (unlike the
  * reference's Postgres, schema.sql:30/46) no storage-level unique
  * constraint exists over Parquet. All plain Catalyst expressions.
  */
object Quality {

  /** Quarter-label format check (reference config.py:84): `^\d{4}-Q[1-4]$`. */
  def labelValid(label: Column): Column = label.rlike("^\\d{4}-Q[1-4]$")

  /** Ticker length check (reference config.py:82): 1..10 chars. */
  def tickerValid(ticker: Column): Column = length(ticker).between(1, 10)

  /** Tolerance comparison (reference transform.py:245-259):
    * `abs(actual - expected) <= tol`. Null actual -> false (reference skips
    * null metrics, load.py:272).
    */
  def withinTolerance(actual: Column, expected: Column, tol: Column): Column =
    coalesce(abs(actual - expected) <= tol, lit(false))

  /** Rows violating a natural-key uniqueness contract: the engine-level
    * replacement for the reference's DB unique constraint (SURVEY.md §4).
    * Empty result == contract holds. One hash-aggregate; map-side partial
    * aggregation keeps the shuffle proportional to the number of distinct
    * keys, not rows.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)

  /** Split a frame into (clean, quarantine) on a validity predicate —
    * the engine's version of the reference's skip-row-and-warn tolerance
    * (transform.py:98-100): bad rows are counted and kept inspectable,
    * never dropped silently and never a task failure.
    */
  def quarantine(df: DataFrame, valid: Column): (DataFrame, DataFrame) =
    (df.where(valid), df.where(!coalesce(valid, lit(false))))

  /** Per-group winsorization — clamp `valueCol` into its group's
    * [lo, hi] percentile band, the outlier treatment a feature/label
    * pipeline applies before aggregates that heavy tails would dominate.
    * Exact interpolated percentiles (deterministic: the aggregate sorts
    * internally, so partitioning cannot move the cut) computed ONCE per
    * group and joined back — the group-bounds table is |groups| rows, so
    * Catalyst broadcasts it and the clamp itself is scan-side. Null
    * values pass through unclamped (no fabricated bounds), and so do
    * null GROUP KEYS: the bounds join is null-safe (`<=>` per key, which
    * BroadcastHashJoin supports natively), so the null group clamps into
    * its own bounds instead of vanishing through an unmatched equi-join —
    * an engine would silently lose every null-keyed row there. At 100 TB
    * swap `percentile` for `approx_percentile` exactly as
    * `profile_quantiles_approx` does — same plan, t-digest bounds.
    */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val v = col(valueCol).cast(org.apache.spark.sql.types.DoubleType)
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(v, lit(lo)).as("_w_lo"), percentile(v, lit(hi)).as("_w_hi"))
    val bAliased = groupCols.foldLeft(bounds)(
      (b, c) => b.withColumnRenamed(c, s"_w_g_$c"))
    val joinCond = groupCols.map(c => col(c) <=> col(s"_w_g_$c")).reduce(_ && _)
    // Left join + null-coalesced bounds: even a group missing from the
    // bounds table (impossible today — bounds derive from df — but cheap
    // insurance against a future pre-filtered bounds source) passes
    // through unclamped rather than dropping rows.
    df.join(broadcast(bAliased), joinCond, "left")
      .withColumn(s"${valueCol}_w",
        when(v.isNull, lit(null))
          .otherwise(least(greatest(v, col("_w_lo")), col("_w_hi"))))
      .drop(groupCols.map(c => s"_w_g_$c") :+ "_w_lo" :+ "_w_hi": _*)
  }
}
