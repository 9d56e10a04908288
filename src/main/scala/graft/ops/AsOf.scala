package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator the reference lacks but a time-series
  * analytics engine needs (flagged as the natural `events`-table extension
  * in SURVEY.md §2.10/§7.6). Composed from built-ins per the preference
  * order (compose > custom Expression > custom plan): union the two sides,
  * one window pass per key carrying the latest right-side values forward.
  *
  * Physical shape: ONE shuffle on the key + one sort — the same cost as a
  * sort-merge join, with no range-explosion. This is the scalable form: a
  * naive `left.join(right, key && rt <= lt)` + groupBy-max is O(matches)
  * and explodes on hot keys at 100 TB; this stays O(left + right).
  */
object AsOf {

  /** For each left row, attach `valueCols` from the latest right row with
    * `right(timeCol) <= left(timeCol)` and equal `keyCols` (inclusive
    * backward as-of; null-padded when no prior right row exists).
    *
    * `rightTiebreak` orders right rows sharing (key, time); the last one
    * under this order wins — pass a unique column for determinism.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], timeCol: String,
                       valueCols: Seq[String],
                       rightTiebreak: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    // Right rows sort before left rows at equal time (_side 0 < 1) so that
    // `<=` is inclusive; rightTiebreak orders simultaneous right rows.
    val l = valueCols.foldLeft(left.withColumn("_side", lit(1)).withColumn("_tb", lit(null).cast("long"))) {
      (df, v) => df.withColumn(v, lit(null))
    }
    val r0 = right.select((keyCols :+ timeCol).map(col) ++ valueCols.map(col) :+ rightTiebreak.cast("long").as("_tb"): _*)
    val r = leftCols.foldLeft(r0.withColumn("_side", lit(0))) { (df, c) =>
      if (keyCols.contains(c) || c == timeCol) df else df.withColumn(c, lit(null))
    }
    val u = l.select((leftCols ++ valueCols ++ Seq("_side", "_tb")).map(col): _*)
      .unionByName(r.select((leftCols ++ valueCols ++ Seq("_side", "_tb")).map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("_side").asc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_side", "_tb")
  }
}
