package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-window operators (SURVEY.md §2.5). */
object Windows {

  /** Top-k rows per group under a total order (reference O-L2,
    * extract.py:162: most-recent-8 quarters per ticker). `order` must be a
    * total order (include a unique tiebreaker) for deterministic output.
    *
    * Physical shape: one shuffle on `partitionCols`, then a per-partition
    * sort; Spark's `WindowExec` with a rank predicate pushes the limit into
    * the window group (`WindowGroupLimit` in Spark 3.5+/4.x), so each group
    * keeps only k rows in memory — safe under skew at 100 TB.
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    require(!df.columns.contains("_rn"),
      "topKPerGroup reserves column name _rn internally; rename the input column")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }
}
