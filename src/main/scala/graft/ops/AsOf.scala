package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — an operator the reference lacks but a time-series
  * analytics engine needs (flagged as the natural `events`-table extension
  * in SURVEY.md §2.10/§7.6). Composed from built-ins per the preference
  * order (compose > custom Expression > custom plan): union the two sides,
  * one window pass per key carrying the nearest right-side values across.
  *
  * Physical shape: ONE shuffle on the key + one sort — the same cost as a
  * sort-merge join, with no range-explosion. This is the scalable form: a
  * naive `left.join(right, key && rt <= lt)` + groupBy-max is O(matches)
  * and explodes on hot keys at 100 TB; this stays O(left + right).
  * Backward (latest prior), forward (earliest following), and an optional
  * tolerance (matches farther than `toleranceMs` null out) cover the
  * pandas/polars `merge_asof` direction/tolerance surface.
  */
object AsOf {

  /** For each left row, attach `valueCols` from the latest right row with
    * `right(timeCol) <= left(timeCol)` and equal `keyCols` (inclusive
    * backward as-of; null-padded when no prior right row exists).
    *
    * `rightTiebreak` orders right rows sharing (key, time); the last one
    * under this order wins — pass a unique column for determinism.
    * `toleranceMs`: matched rows more than this many milliseconds before
    * the left row have their carried values nulled (merge_asof tolerance).
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], timeCol: String,
                       valueCols: Seq[String],
                       rightTiebreak: Column,
                       toleranceMs: Option[Long] = None): DataFrame =
    asofJoin(left, right, keyCols, timeCol, valueCols, rightTiebreak,
      forward = false, toleranceMs)

  /** Forward as-of: `valueCols` from the EARLIEST right row with
    * `right(timeCol) >= left(timeCol)`; the FIRST right row under
    * `rightTiebreak` wins among simultaneous ones (mirror of backward).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      keyCols: Seq[String], timeCol: String,
                      valueCols: Seq[String],
                      rightTiebreak: Column,
                      toleranceMs: Option[Long] = None): DataFrame =
    asofJoin(left, right, keyCols, timeCol, valueCols, rightTiebreak,
      forward = true, toleranceMs)

  private def asofJoin(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], timeCol: String,
                       valueCols: Seq[String], rightTiebreak: Column,
                       forward: Boolean, toleranceMs: Option[Long]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Internal scratch names: withColumn would silently REPLACE a user
    // column of the same name (and a valueCol named `_rts` would collide
    // inside the match struct), so reject them up front instead of
    // producing corrupt output.
    val reserved = Set("_m", "_side", "_tb", "_rts")
    val clash = (leftCols ++ right.columns ++ valueCols).filter(reserved)
    require(clash.isEmpty,
      s"asofJoin reserves column names ${reserved.mkString(", ")} internally; " +
        s"rename input column(s) ${clash.distinct.mkString(", ")}")
    // The matched right ROW travels as ONE struct (its event time plus the
    // value columns): `last(_m, ignoreNulls)` selects the nearest right
    // ROW — pandas merge_asof semantics, and exactly what a correlated
    // `ORDER BY ts LIMIT 1` oracle computes. Carrying value columns
    // individually would let each value skip back past null-valued rows
    // independently, decoupling the carried value from the matched row's
    // time (and thus from the tolerance gate).
    val r0 = right.select(
      keyCols.map(col) :+ col(timeCol) :+ rightTiebreak.cast("long").as("_tb") :+
        struct(col(timeCol).as("_rts") +: valueCols.map(col): _*).as("_m"): _*)
    val mType = r0.schema("_m").dataType
    val l = left.withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast("long"))
      .withColumn("_m", lit(null).cast(mType))
    // Right rows sort before left rows at equal time (_side 0 < 1) so the
    // match is inclusive in BOTH directions; rightTiebreak orders
    // simultaneous right rows — `last(...)` under the backward (asc)
    // ordering keeps the largest tiebreak, and under the forward (desc)
    // ordering keeps the smallest: the mirror semantics documented above.
    val r = leftCols.foldLeft(r0.withColumn("_side", lit(0))) { (df, c) =>
      if (keyCols.contains(c) || c == timeCol) df else df.withColumn(c, lit(null))
    }
    val cols = leftCols ++ Seq("_m", "_side", "_tb")
    val u = l.select(cols.map(col): _*).unionByName(r.select(cols.map(col): _*))
    val timeOrder = if (forward) col(timeCol).desc else col(timeCol).asc
    val tbOrder = if (forward) col("_tb").desc_nulls_first else col("_tb").asc_nulls_first
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(timeOrder, col("_side").asc, tbOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("_m", last(col("_m"), ignoreNulls = true).over(w))
    val gated = toleranceMs match {
      case None => filled
      case Some(tol) => filled.withColumn("_m",
        when(col("_m").isNotNull &&
          abs(unix_millis(col(timeCol)) - unix_millis(col("_m._rts"))) <= tol,
          col("_m")))
    }
    val out = valueCols.foldLeft(gated)((df, v) => df.withColumn(v, col(s"_m.$v")))
    out.where(col("_side") === 1).drop("_side", "_tb", "_m")
  }
}
