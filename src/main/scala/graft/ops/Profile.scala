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
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast(StringType).as(s"${c}__min"),
        max(col(c)).cast(StringType).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
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
}
