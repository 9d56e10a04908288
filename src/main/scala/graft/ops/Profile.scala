package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the data-quality reconnaissance pass a training-data
  * pipeline runs before trusting a new 100 TB drop: per-column null
  * counts, exact distinct counts, and min/max, all in ONE scan + one
  * shuffle (a single multi-aggregate; no per-column jobs).
  */
object Profile {

  /** One output row per profiled column: (column, n_rows, n_null,
    * n_distinct, min_str, max_str). Min/max are rendered to strings so
    * heterogeneous column types stack into one frame.
    *
    * Plan shape: a min/max whose AGGREGATION BUFFER is variable-width
    * (string/binary/precision>18 decimal) disqualifies HashAggregate, and
    * because the multi-column `countDistinct` rewrite puts every
    * aggregate into ONE operator over an Expand, a single string min/max
    * used to demote the whole 4x-expanded distinct pipeline to
    * SortAggregate with full sorts (measured 2.3x slower at sf0.1; at
    * 100 TB a full sort of 4x the table vs a hash probe is the
    * difference between hours and minutes). Var-width min/max therefore
    * runs in its OWN keyless aggregate (no keys -> no sort, and the scan
    * is pruned to just those columns) cross-joined back onto the
    * hash-friendly one-row result.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    def fixedWidth(dt: DataType): Boolean = dt match {
      case _: NumericType | BooleanType | DateType | TimestampType |
           TimestampNTZType => dt match {
        case d: DecimalType => d.precision <= 18
        case _ => true
      }
      case _ => false
    }
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct")) ++
      (if (fixedWidth(df.schema(c).dataType))
        Seq(min(col(c)).cast(StringType).as(s"${c}__min"),
          max(col(c)).cast(StringType).as(s"${c}__max"))
      else Nil)
    }
    val varAggs = cols.filterNot(c => fixedWidth(df.schema(c).dataType)).flatMap { c =>
      Seq(min(col(c)).cast(StringType).as(s"${c}__min"),
        max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    val hashSide = df.agg(aggs.head, aggs.tail: _*)
    val wide =
      if (varAggs.isEmpty) hashSide
      else hashSide.crossJoin(df.agg(varAggs.head, varAggs.tail: _*))
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col(s"${c}__rows").as("n_rows"),
        col(s"${c}__nulls").as("n_null"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_str"), col(s"${c}__max").as("max_str"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Exact interpolated quantiles of `valueCol` per group — the
    * distribution-drift probe of a data-quality pass: one row per
    * (group, prob). Exact `percentile` sorts each group; on a 100 TB
    * column switch to `approx_percentile` (t-digest, map-side
    * combinable) and gate with a tolerance check instead of equality.
    */
  def quantiles(df: DataFrame, valueCol: String, groupCols: Seq[String],
                probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be within [0, 1]")
    val pArr = array(probs.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), pArr).as("qs"))
      .select(groupCols.map(col) :+ posexplode(col("qs")).as(Seq("pos", "q_value")): _*)
      .withColumn("prob", element_at(pArr, col("pos") + 1))
      .select(groupCols.map(col) ++ Seq(col("prob"), col("q_value")): _*)
  }

  /** Exact heavy hitters — every item whose count is ≥ num/den of the
    * table — without ever shuffling the full key space. The frequency
    * threshold is a RATIONAL (`count·den ≥ total·num` in integer math)
    * so the cut is bit-deterministic in any engine.
    *
    * Two passes, both sketch-sized on the wire:
    *  1. one scan → a Misra–Gries candidate sketch (≤ k counters per
    *     partition through the exchange — the key space's cardinality
    *     never prices the shuffle) plus the exact row count, in a single
    *     1-row aggregate. `k = slack·den/num` makes the sketch a proven
    *     candidate SUPERSET of the true heavy hitters (MG bound: any
    *     item with count ≥ total/(k+1) survives; the threshold is
    *     total·num/den ≥ slack·total/k ≫ total/(k+1)).
    *  2. one more scan, semi-joined against the ≤ k broadcast
    *     candidates → exact counts of candidates only (map-side combine
    *     bounds the exchange at k rows per partition), cross-joined with
    *     the 1-row total (the bounded-broadcast pattern of
    *     Recall/Profile) and cut at the exact rational threshold.
    *
    * The sketch's own counter VALUES vary with partitioning (only its
    * superset guarantee is invariant), so they never reach the output:
    * the result is exactly `groupBy(item).count.filter(cnt·den ≥
    * total·num)` — deterministic, DuckDB-replicable — at sketch-shuffle
    * cost. Output: (item, cnt), the exact count.
    */
  def heavyHitters(df: DataFrame, itemCol: String, num: Long, den: Long,
                   slack: Int = 4): DataFrame = {
    require(num > 0 && den >= num, "need a frequency fraction 0 < num/den <= 1")
    require(slack >= 2, "slack < 2 voids the candidate-superset guarantee")
    val k = math.min(10_000_000L, den / num * slack).toInt
    import graft.functions.HeavyHittersAggregate.misraGries
    // Integral items widen to long (matching the sketch's key type);
    // strings pass through.
    val item =
      if (df.schema(itemCol).dataType == StringType) col(itemCol)
      else col(itemCol).cast(LongType)
    // Persisted because BOTH pass-2 inputs (candidate list, exact total)
    // read it — without the persist the pass-1 scan would run twice.
    // Bounded: exactly ONE row carrying ≤ k counters.
    val sketch = df.agg(
      misraGries(item, k).as("cand"),
      count(lit(1)).as("total")).persist()
    val cands = sketch.select(explode(col("cand")).as("c"))
      .select(col("c.item").as("_hh_cand"))
    val candidateRows = df
      .join(broadcast(cands), item === col("_hh_cand"), "left_semi")
    candidateRows.groupBy(item.as("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(sketch.select(col("total"))))
      .where(col("cnt") * lit(den) >= col("total") * lit(num))
      .select(col("item"), col("cnt"))
  }
}
