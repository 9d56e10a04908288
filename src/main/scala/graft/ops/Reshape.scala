package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide <-> long reshaping (reference extract.py:158-187, S5 in SURVEY.md
  * §2.1): the yfinance fallback source arrives as a metric x date matrix;
  * the reference melts it to per-quarter rows and pivots selected metrics
  * back. Spark-first form: `Dataset.unpivot` (codegen'd Expand — one pass,
  * no shuffle) and `RelationalGroupedDataset.pivot` with an EXPLICIT
  * metric list (never the value-discovery overload, which runs an extra
  * distinct job over the long table before planning — at 100 TB that is a
  * full scan just to learn the column names).
  */
object Reshape {

  /** Wide -> long: one output row per (id row, metric). `values` columns
    * must share a common type (cast first). Expand-based: no shuffle, the
    * scan stays column-pruned to ids ++ values.
    */
  def unpivotToLong(df: DataFrame, ids: Seq[String], values: Seq[String],
                    metricCol: String = "metric", valueCol: String = "value"): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, metricCol, valueCol)

  /** Long -> wide: one row per id, one column per metric in `metrics`.
    * `first` is safe because (ids, metric) is unique after unpivot; the
    * explicit `metrics` list keeps planning single-pass.
    */
  def pivotToWide(df: DataFrame, ids: Seq[String], metricCol: String,
                  valueCol: String, metrics: Seq[String]): DataFrame =
    df.groupBy(ids.map(col): _*)
      .pivot(metricCol, metrics)
      .agg(first(col(valueCol)))
}
