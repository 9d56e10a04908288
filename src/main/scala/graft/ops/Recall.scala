package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Recall audits for the approximate tiers (LSH / IVF / quantized): each
  * produces a ONE-ROW report comparing an approximate result against its
  * exact twin, with a `meets_floor` boolean gated in the driver contract.
  * The oracle twin hard-codes `meets_floor = TRUE`, so a parameter change
  * that silently tanks recall turns the Spark row false and the gate red —
  * the `agg_approx_distinct` tripwire pattern — while the recall VALUE is
  * replicated by both engines and catches engine bugs.
  *
  * All ratios are derived from integer counts (hit/total), never from
  * floating-point aggregation, so the report is deterministic under any
  * partitioning; the inputs are audit-scale (k rows per query, or the
  * verified pair sets), so these joins never dominate a run.
  */
object Recall {

  /** Top-k recall of `approx` vs `exact`, both shaped
    * (query_id, rank, neighbor_id, ...). Per-query hit counts aggregate to
    * mean recall = sum(hits) / (n_queries * k) — integer arithmetic until
    * the final division. Queries in `exact` but absent from `approx`
    * count zero hits (a left join, so an approximate tier that drops a
    * query entirely cannot inflate the mean).
    */
  def topKRecall(approx: DataFrame, exact: DataFrame, k: Int,
                 floor: Double): DataFrame = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    val per = exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
    per.agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("total_hits"),
        min(col("hits")).as("min_hits"))
      .select(col("n_queries"),
        round(col("total_hits").cast(DoubleType) /
          (col("n_queries") * k).cast(DoubleType), 6).as("mean_recall"),
        round(col("min_hits").cast(DoubleType) / lit(k.toDouble), 6).as("min_recall"))
      .withColumn("meets_floor", col("mean_recall") >= floor)
  }

  /** Pair recall of `approx` vs `exact`, both shaped (doc_a, doc_b, ...)
    * with doc_a < doc_b. Approximate tiers verify candidates exactly, so
    * approx is a subset of exact and recall = |approx| / |exact|; the
    * report still counts the intersection explicitly so a buggy tier
    * emitting NON-subset pairs shows up as n_approx > n_hits.
    */
  def pairRecall(approx: DataFrame, exact: DataFrame,
                 floor: Double): DataFrame = {
    val a = approx.select(col("doc_a"), col("doc_b"))
    val e = exact.select(col("doc_a"), col("doc_b"))
    val nHits = a.join(e, Seq("doc_a", "doc_b")).agg(count(lit(1)).as("n_hits"))
    val nA = a.agg(count(lit(1)).as("n_approx"))
    val nE = e.agg(count(lit(1)).as("n_exact"))
    // Three 1-row aggregates; the cross joins broadcast single rows.
    nE.crossJoin(broadcast(nA)).crossJoin(broadcast(nHits))
      .select(col("n_exact"), col("n_approx"),
        round(col("n_hits").cast(DoubleType) / col("n_exact").cast(DoubleType), 6)
          .as("recall"))
      .withColumn("meets_floor", col("recall") >= floor)
  }
}
