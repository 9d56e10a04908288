package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** State-table compaction (SCALE.md "incremental ingestion"): every
  * incremental wave — `corpusDedupSink`'s per-micro-batch appends, the
  * batch gates' state writes — adds `shuffle.partitions` parquet files to
  * the persisted index. At one wave per minute a year of ingest is ~4 M
  * files: scan planning, footer reads, and namenode metadata dominate
  * long before data volume does (the classic small-file problem). This
  * rewrites a parquet directory down to a bounded file count as a fully
  * distributed job, preserving rows, schema, and any hive-style partition
  * layout, then swaps the rewrite in via two directory renames.
  *
  * The swap is NOT atomic versus concurrent readers (plain parquet dirs
  * have no transaction log): callers run compaction from the single
  * maintainer that owns the state table — the same single-writer
  * precondition the wave-keyed sinks already require. A reader holding
  * the OLD listing can lose files mid-scan; a crash between the two
  * renames leaves the original intact at `<path>__compact_old` (the
  * rewrite at `<path>__compact_tmp`), so recovery is a manual rename,
  * never data loss.
  */
object Compact {

  /** Post-compaction accounting, from the rewritten directory. */
  final case class Stats(rows: Long, filesBefore: Int, filesAfter: Int)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, root: Path): Int = {
    val it = fs.listFiles(root, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /** Rewrites the parquet table at `path` into ceil(rows / targetRows)
    * files (per partition-column tuple when `partitionCols` is set — the
    * wave-partitioned streaming state keeps its `wave=N` dirs, so the
    * sinks' dynamic-overwrite replay safety survives compaction).
    * Returns the row count and before/after data-file counts; row count
    * is read back from the REWRITTEN table so the stat doubles as a
    * cheap post-swap sanity check.
    */
  def compactParquet(spark: SparkSession, path: String,
                     partitionCols: Seq[String] = Nil,
                     targetRows: Long = 4000000L): Stats = {
    require(targetRows > 0, "targetRows must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"compactParquet: no table at $path")
    val before = dataFiles(fs, p)
    val df = spark.read.parquet(path)
    val rows = df.count()
    val nOut = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    // Repartition by the partition columns so each hive partition is
    // written by the tasks that own its rows (no thousand-task fan-out
    // of tiny files); unpartitioned tables get a plain nOut-way shuffle.
    val shaped =
      if (partitionCols.nonEmpty)
        df.repartition(nOut, partitionCols.map(df.col): _*)
      else df.repartition(nOut)
    val tmp = new Path(path + "__compact_tmp")
    val old = new Path(path + "__compact_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    val writer = shaped.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp.toString)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compactParquet: cannot stage $path aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back; original was untouched
      throw new java.io.IOException(s"compactParquet: cannot swap in rewrite for $path")
    }
    fs.delete(old, true)
    val after = dataFiles(fs, p)
    val rowsAfter = spark.read.parquet(path).count()
    require(rowsAfter == rows,
      s"compactParquet: row count changed $rows -> $rowsAfter at $path")
    Stats(rows, before, after)
  }
}
