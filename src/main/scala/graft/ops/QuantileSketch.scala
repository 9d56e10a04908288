package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Mergeable quantile-sketch state for incremental profiling — the
  * companion to [[IncrementalAgg]]'s count/sum/min/max: a per-key
  * HDR-histogram-style sketch over NON-NEGATIVE long values (scale
  * decimals to integer cents first) that folds new batches in O(batch)
  * instead of re-sorting O(history) per run.
  *
  * Bucketing keeps the value's top [[SubBits]]+1 significant bits:
  * `bucket = shift * 16 + (v >> shift)` with
  * `shift = max(msb(v) - SubBits, 0)` — contiguous, monotonic, and a
  * fixed relative width of 2^-SubBits (6.25%), so any quantile read off
  * the sketch is within ~6.25% of the true value regardless of scale.
  * Everything is INTEGER arithmetic on the value's bit pattern (msb via
  * `length(bin(v))`, shifts, integer compares): no logarithms whose
  * last-ulp rounding could disagree across engines, no randomness like
  * KLL compaction coins, no insertion-order dependence like
  * Greenwald-Khanna — the sketch is bit-identical under any partitioning
  * and batch grouping, and exactly replicable by an independent engine.
  *
  * The state is a sorted array<struct<bucket,cnt>> per key: merging is
  * explode + grouped sum + re-collect (touched keys only), the same
  * algebraic-merge property as [[IncrementalAgg.merge]] —
  * `merge(sketch(A), sketch(B)) == sketch(A ∪ B)` EXACTLY, asserted in
  * QuantileSketchSpec and graded by the `incremental_quantiles` gate
  * against a single-shot oracle histogram.
  */
object QuantileSketch {

  /** Sub-bucket precision bits: relative bucket width 2^-SubBits. */
  val SubBits = 4
  private val SubCount = 1 << SubBits // 16

  /** HDR bucket id of a non-negative long (raises on negatives — a signed
    * sketch needs an explicit sign-split layer, not silent wraparound).
    */
  def bucketOf(u: Column): Column = {
    val msb = (length(bin(u)) - 1).cast(LongType)
    val shift = greatest(msb - SubBits, lit(0L))
    val bucket = shift * SubCount +
      call_function("shiftright", u, shift.cast(IntegerType))
    when(u < 0, raise_error(concat(
        lit("QuantileSketch requires non-negative values, got "), u.cast("string")))
      .cast(LongType))
      .otherwise(bucket)
  }

  /** Upper edge of a bucket (the value reported for quantiles — an
    * overestimate by at most one part in 2^SubBits). Inverse of
    * [[bucketOf]]: buckets below 2*SubCount are exact values.
    */
  def bucketUpper(b: Column): Column = {
    val shift = shiftright(b, SubBits).cast(LongType) - 1
    val subIdx = b.cast(LongType) - shift * SubCount
    when(b < 2 * SubCount, b.cast(LongType))
      .otherwise(call_function("shiftleft", subIdx + 1, shift.cast(IntegerType)) - 1)
  }

  /** Per-key sketch of one batch: (keys..., sketch, n). Nulls are
    * excluded (they carry no magnitude); `n` counts sketched rows.
    */
  def summarize(batch: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    batch.select(keys.map(col) :+ valueCol.cast(LongType).as("_v"): _*)
      .where(col("_v").isNotNull)
      .groupBy(keys.map(col) :+ bucketOf(col("_v")).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("bucket"), col("cnt")))).as("sketch"),
        sum(col("cnt")).as("n"))

  /** Fold a batch sketch into the running state: explode both, sum counts
    * per (key, bucket), re-collect sorted. One shuffle keyed on `keys`;
    * only keys present in either side are touched.
    */
  def merge(state: DataFrame, batchSummary: DataFrame, keys: Seq[String]): DataFrame = {
    def exploded(df: DataFrame): DataFrame =
      df.select(keys.map(col) :+ explode(col("sketch")).as("e"): _*)
        .select(keys.map(col) :+ col("e.bucket").as("bucket") :+ col("e.cnt").as("cnt"): _*)
    exploded(state).unionByName(exploded(batchSummary))
      .groupBy(keys.map(col) :+ col("bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col("bucket"), col("cnt")))).as("sketch"),
        sum(col("cnt")).as("n"))
  }

  /** Read quantiles off a sketch state. Each requested quantile is a
    * (columnName, num, den) rational — `cum * den >= n * num` selects the
    * smallest bucket at or past the target rank with INTEGER arithmetic
    * only (no ceil-of-double boundary cases). Output: keys..., n, one
    * long column per quantile (bucket upper edge).
    */
  def quantiles(state: DataFrame, keys: Seq[String],
                qs: Seq[(String, Int, Int)]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val ex = state
      .select(keys.map(col) ++ Seq(col("n"), explode(col("sketch")).as("e")): _*)
      .select(keys.map(col) ++ Seq(col("n"), col("e.bucket").as("bucket"),
        col("e.cnt").as("cnt")): _*)
    // Per-key cumulative counts in bucket order: the window partitions on
    // the full key, so it scales with key count, and each key holds at
    // most a few hundred buckets (64 shifts x 16 sub-buckets).
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket"))
    val cum = ex.withColumn("cum", sum(col("cnt")).over(w))
    val aggs = first(col("n")).as("n") +: qs.map { case (name, num, den) =>
      require(num > 0 && den > 0 && num <= den, s"quantile $name=$num/$den out of (0,1]")
      min(when(col("cum") * den >= col("n") * num, col("bucket"))).as(s"_b_$name")
    }
    val picked = cum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    qs.foldLeft(picked) { case (df, (name, _, _)) =>
      df.withColumn(name, bucketUpper(col(s"_b_$name"))).drop(s"_b_$name")
    }
  }
}
