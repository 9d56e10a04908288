package graft.io

import java.net.URI
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Sinks: atomic Parquet state-table swap (the engine's replacement for
  * the reference's transactional upsert, load.py:36-48) and the ordered
  * single-file CSV export (transform.py:281-289).
  */
object Sinks {

  /** Write `df` to `tablePath` atomically: write to a `_tmp` sibling, then
    * rename over the target. Readers never observe a half-written table —
    * the Parquet-only stand-in for Delta/Iceberg ACID (SURVEY.md §4).
    */
  def atomicSwapWrite(spark: SparkSession, df: DataFrame, tablePath: String): Unit = {
    val tmp  = tablePath + "_tmp"
    val old  = tablePath + "_old"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = FileSystem.get(new URI(tablePath), spark.sparkContext.hadoopConfiguration)
    val target = new Path(tablePath)
    val oldP   = new Path(old)
    if (fs.exists(oldP)) fs.delete(oldP, true)
    if (fs.exists(target)) fs.rename(target, oldP)
    fs.rename(new Path(tmp), target)
    fs.delete(oldP, true)
    // Invalidate cached file listings so subsequent reads see the new
    // generation. (DataFrames created BEFORE the swap hold the old file
    // list and will fail — swap semantics, same as any non-ACID overwrite;
    // collect or re-read after merging.)
    spark.catalog.refreshByPath(tablePath)
  }

  /** Ordered CSV export (reference S7+O-O1): global sort, then a single
    * header file. `coalesce(1)` is deliberate and ONLY valid at export
    * grain — state tables stay partition-parallel.
    */
  def exportCsv(df: DataFrame, dir: String, sortCols: Seq[org.apache.spark.sql.Column]): Unit =
    df.orderBy(sortCols: _*).coalesce(1)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(dir)
}
