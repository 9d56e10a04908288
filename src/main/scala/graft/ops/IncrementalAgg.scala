package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollups: instead of re-aggregating the full
  * fact history per batch (O(history) per run — the batch-ETL cost that
  * stops scaling first), keep a MERGEABLE per-key state of
  * (count, sum, min, max) and fold each new batch in with one
  * aggregate + one key-equi merge. sum/count compose by addition,
  * min/max by min/max — so `merge(state(A), summarize(B)) ==
  * summarize(A ∪ B)` exactly (the algebraic-aggregate property;
  * averages derive as sum/count at read time, never stored).
  *
  * Decimal sums keep the merge order-independent: the state is
  * bit-identical no matter how batches were grouped — asserted in
  * IncrementalAggSpec and graded by the `incremental_rollup` gate
  * against a single-shot oracle aggregate.
  */
object IncrementalAgg {

  /** Per-key mergeable summary of one batch: (keys..., cnt, sum_v,
    * min_v, max_v). `valueCol` should already be exact-typed (cast
    * doubles to DECIMAL first — see the determinism ground rules).
    */
  def summarize(batch: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(valueCol).as("sum_v"),
        min(valueCol).as("min_v"), max(valueCol).as("max_v"))

  /** Fold a new batch summary into the running state: full outer merge on
    * the keys, component-wise combination. One shuffle keyed on `keys`
    * (co-located and exchange-free when the state is bucket-written by
    * the same keys — [[graft.io.Sinks.writeBucketedState]]).
    */
  def merge(state: DataFrame, batchSummary: DataFrame, keys: Seq[String]): DataFrame = {
    val s = keys.foldLeft(state)((df, k) => df.withColumnRenamed(k, s"_s_$k"))
      .withColumnRenamed("cnt", "_s_cnt").withColumnRenamed("sum_v", "_s_sum")
      .withColumnRenamed("min_v", "_s_min").withColumnRenamed("max_v", "_s_max")
    val joinCond = keys.map(k => col(s"_s_$k") <=> col(k)).reduce(_ && _)
    s.join(batchSummary, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"_s_$k")).as(k)) ++ Seq(
          (coalesce(col("_s_cnt"), lit(0L)) + coalesce(col("cnt"), lit(0L))).as("cnt"),
          when(col("_s_sum").isNull, col("sum_v"))
            .when(col("sum_v").isNull, col("_s_sum"))
            .otherwise(col("_s_sum") + col("sum_v")).as("sum_v"),
          least(col("_s_min"), col("min_v")).as("min_v"),
          greatest(col("_s_max"), col("max_v")).as("max_v")): _*)
  }
}
