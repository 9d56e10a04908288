package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Summary / health queries (reference load.py:229-246, main.py:140-154):
  * dim left-joined to per-key fact counts, plus rollup grand totals.
  */
object Summary {

  /** Per-dim-row fact counts, keeping zero-fact dim rows (reference
    * O-J4/O-A3). Aggregate-then-join: the fact table is reduced to one row
    * per key BEFORE the join, so the join input is |distinct keys|, not
    * |facts| — the order that survives a 100x fact-table scale-up.
    */
  def dimFactCounts(dim: DataFrame, facts: DataFrame, dimKey: String,
                    factKey: String, cntName: String): DataFrame = {
    val counts = facts.groupBy(col(factKey)).agg(count(lit(1)).as(cntName))
    dim.join(counts, dim(dimKey) === counts(factKey), "left")
      .drop(factKey)
      .withColumn(cntName, coalesce(col(cntName), lit(0L)))
  }

  /** Per-group counts plus the grand total in one pass (reference O-A4,
    * main.py:128) via ROLLUP — one shuffle instead of two actions.
    */
  def countsWithTotal(df: DataFrame, groupCol: String): DataFrame =
    df.rollup(col(groupCol)).agg(count(lit(1)).as("cnt"))
}
