package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Interval (range-containment) join: each left row pairs with the right
  * intervals that contain its time, optionally per key — the
  * "label each event with its containing session / promo window /
  * maintenance window" operator.
  *
  * Physical shape: a naive `left.join(right, key && t BETWEEN s AND e)`
  * plans as a cross-ish theta join — per key, |left| x |right| candidate
  * pairs; at 100 TB a hot key explodes. This form BINS time: each right
  * interval is exploded to the fixed-width bins it covers, each left row
  * computes its single bin, and the join is an EQUI-join on (keys, bin)
  * that Spark hash-partitions like any other — the per-pair work is then
  * an exact containment filter. A (left, right) pair can only meet in the
  * left row's own bin, so no dedup pass is needed. Choose `binWidth` near
  * the typical interval length: cost is O(intervals x span/binWidth)
  * exploded rows, never |left| x |right|.
  */
object RangeJoin {

  /** Join `left` rows to containing `right` intervals (inclusive bounds)
    * with equal `keys`. Time columns may be TIMESTAMP (binned in epoch
    * micros — `binWidth` is then in MICROseconds) or integral. Output:
    * all left columns + all non-key right columns; left rows in no
    * interval are dropped (inner semantics).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTimeCol: String, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val reserved = Seq("_bin", "_bins")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"intervalJoin reserves ${reserved.mkString(", ")}; rename ${clash.mkString(", ")}")

    // All three time columns must be the same KIND: a TIMESTAMP left is
    // binned in epoch micros while integral bounds bin in raw units — a
    // mixed layout (e.g. epoch-millis longs on one side) would silently
    // mis-bin by 1000x and drop genuinely-contained rows.
    val kinds = Seq(left.schema(leftTimeCol).dataType,
      right.schema(startCol).dataType, right.schema(endCol).dataType)
      .map { case TimestampType => "timestamp"; case _ => "integral" }
    require(kinds.distinct.size == 1,
      s"intervalJoin time columns must agree in type: $leftTimeCol/$startCol/$endCol are " +
        s"${kinds.mkString("/")} — convert to one representation first")
    def asLong(df: DataFrame, c: String): Column = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _ => col(c).cast(LongType)
    }
    // Exact integral floor-division (pmod keeps negatives correct);
    // double floor(x/w) would misround near bin edges at micro precision.
    def bin(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / lit(binWidth)).cast(LongType)

    val l = left.withColumn("_bin", bin(asLong(left, leftTimeCol)))
    val r = right
      .withColumn("_bins",
        sequence(bin(asLong(right, startCol)), bin(asLong(right, endCol))))
      .withColumn("_bin", explode(col("_bins"))).drop("_bins")
    val lt = asLong(left, leftTimeCol)
    l.join(r, keys :+ "_bin")
      .where(lt >= asLong(right, startCol) && lt <= asLong(right, endCol))
      .drop("_bin")
  }
}
