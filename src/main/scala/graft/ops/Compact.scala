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

  /** Size-tiered accounting: `rowsRewritten`/`bytesRewritten` cover only
    * the merged small span; `keptFiles` moved untouched (metadata
    * renames, zero bytes read). A no-op tick returns
    * `filesBefore == filesAfter` with zero rewritten.
    */
  final case class TieredStats(rowsRewritten: Long, bytesRewritten: Long,
                               filesBefore: Int, filesAfter: Int,
                               rewrittenFiles: Int, keptFiles: Int)

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

  private def listData(fs: org.apache.hadoop.fs.FileSystem,
                       root: Path): Seq[(Path, Long)] = {
    val it = fs.listFiles(root, true)
    val out = Seq.newBuilder[(Path, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += ((f.getPath, f.getLen))
    }
    out.result()
  }

  /** The size-tier policy shared by [[compactTiered]] and
    * [[consolidateWaves]]: merge the files below `spanFrac` of the
    * largest (the freshly-appended slices — a previously compacted file
    * towers over them), keep the top tier untouched. A flat tier (all
    * files within a factor of each other, e.g. the very first
    * compaction) degenerates to a full merge once the file count
    * exceeds `maxFiles` — the LSM "major compaction", whose amortized
    * cost stays bounded because it only fires when minor merges have
    * already accumulated `maxFiles` top-tier outputs. Returns
    * (toMerge, toKeep), or None for a no-op tick.
    */
  private def selectSmallSpan(files: Seq[(Path, Long)], spanFrac: Double,
                              minMerge: Int, maxFiles: Int)
      : Option[(Seq[Path], Seq[Path])] = {
    if (files.isEmpty) return None
    val largest = files.map(_._2).max
    val (small, big) = files.partition(_._2 < (largest * spanFrac).toLong)
    if (small.size >= minMerge) Some((small.map(_._1), big.map(_._1)))
    else if (files.size > maxFiles) Some((files.map(_._1), Nil))
    else None
  }

  /** Stages `keep` files into `tmp` by metadata rename and swaps `tmp`
    * in for `p` — the directory-level swap [[compactParquet]] uses,
    * shared by the tiered forms. Not atomic vs concurrent readers
    * (single-maintainer contract); a crash mid-swap leaves the original
    * at `<path>__compact_old`, never data loss.
    */
  private def stageAndSwap(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                           tmp: Path, old: Path,
                           moves: Seq[(Path, Path)]): Unit = {
    moves.foreach { case (src, dst) =>
      fs.mkdirs(dst.getParent)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"compact: cannot stage $src into $dst")
    }
    fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compact: cannot stage $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // roll back; original was untouched
      throw new java.io.IOException(s"compact: cannot swap in rewrite for $p")
    }
    fs.delete(old, true)
  }

  /** Size-tiered (LSM-style) compaction of an UNPARTITIONED parquet
    * directory: merges only the small-file span ([[selectSmallSpan]]),
    * moving top-tier files into the rewrite by metadata rename — so a
    * periodic compaction tick costs O(newly-appended slices), never
    * O(index history), which is what lets a long-lived incremental
    * index (the BM25 tf table) compact on every fold without its
    * rewrite bill growing with the index. [[compactParquet]] remains
    * the full-rewrite form for one-shot use and hive-partitioned
    * layouts.
    */
  def compactTiered(spark: SparkSession, path: String,
                    targetRows: Long = 4000000L, spanFrac: Double = 0.5,
                    minMerge: Int = 2, maxFiles: Int = 8): TieredStats = {
    require(targetRows > 0, "targetRows must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"compactTiered: no table at $path")
    val files = listData(fs, p)
    require(files.forall(_._1.getParent == fs.makeQualified(p)),
      s"compactTiered: $path is partitioned — use consolidateWaves/compactParquet")
    val before = files.size
    selectSmallSpan(files, spanFrac, minMerge, maxFiles) match {
      case None =>
        TieredStats(0L, 0L, before, before, 0, before)
      case Some((small, big)) =>
        val bytes = files.collect { case (f, len) if small.contains(f) => len }.sum
        val df = spark.read.parquet(small.map(_.toString): _*)
        val rows = df.count()
        val nOut = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
        val tmp = new Path(path + "__compact_tmp")
        val old = new Path(path + "__compact_old")
        fs.delete(tmp, true)
        df.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
        val rewritten = listData(fs, tmp).map(_._1.getName)
        stageAndSwap(fs, p, tmp, old,
          big.map(f => f -> new Path(tmp, f.getName)))
        val after = dataFiles(fs, p)
        val rowsBack = spark.read.parquet(
          rewritten.map(n => new Path(p, n).toString): _*).count()
        require(rowsBack == rows,
          s"compactTiered: rewritten rows changed $rows -> $rowsBack at $path")
        TieredStats(rows, bytes, before, after, rewritten.size, big.size)
    }
  }

  /** Size-tiered compaction of a WAVE-PARTITIONED streaming state dir
    * (`wave=N` hive layout, one partition appended per micro-batch by
    * the wave-keyed sinks): merges committed waves' small files into the
    * reserved `wave=-1` consolidated partition, keeps top-tier files by
    * rename, and leaves `currentWave`'s partition untouched.
    *
    * Replay safety: a wave can only re-fire while its batch is
    * UNCOMMITTED, i.e. only `currentWave` — every earlier wave is final
    * the moment the next batch starts. So folding waves < current into
    * `wave=-1` can never be overwritten by a replay (sinks write
    * `wave = batchId >= 0`), while the current wave keeps its own
    * partition precisely because the enclosing foreachBatch may still
    * fail after this call and dynamic-overwrite its wave on retry.
    * Readers drop the wave column, so re-homing rows to wave=-1 is
    * result-transparent (the `streaming_bm25_live` gate's oracle is the
    * full-rebuild SQL).
    *
    * The swap contract matches [[compactParquet]]: the rewrite stages in
    * `<path>__compact_tmp` (current-wave dir and kept files arrive by
    * metadata rename), then two directory renames swap it in —
    * single-maintainer, crash mid-swap recoverable, never data loss.
    */
  def consolidateWaves(spark: SparkSession, path: String, currentWave: Long,
                       targetRows: Long = 4000000L, spanFrac: Double = 0.5,
                       minMerge: Int = 2, maxFiles: Int = 8): TieredStats = {
    require(targetRows > 0, "targetRows must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"consolidateWaves: no table at $path")
    val qp = fs.makeQualified(p)
    val waveDirs = fs.listStatus(p).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("wave="))
    require(waveDirs.nonEmpty || listData(fs, p).isEmpty,
      s"consolidateWaves: $path is not wave-partitioned")
    val (currentDirs, committedDirs) = waveDirs.partition(
      _.getPath.getName == s"wave=$currentWave")
    val committed = committedDirs.flatMap(d => listData(fs, d.getPath)).toSeq
    val before = dataFiles(fs, p)
    // Re-homing is unconditional (directory count must not grow with
    // wave count — a no-op tick per wave would leave one wave=N dir per
    // micro-batch forever); only the REWRITE is size-tiered. A small
    // span merges; everything else — including the case where the tier
    // says nothing is worth merging, e.g. a single slice file per wave
    // under AQE-coalesced writes — moves into wave=-1 by metadata
    // rename, zero bytes read.
    val outside = committed.filterNot(_._1.getParent.getName == "wave=-1")
    val (small, big) =
      selectSmallSpan(committed, spanFrac, minMerge, maxFiles) match {
        case Some((s, b)) => (s, b)
        case None         => (Nil, committed.map(_._1))
      }
    if (small.isEmpty && outside.isEmpty)
      return TieredStats(0L, 0L, before, before, 0, before)
    val bytes = committed.collect { case (f, len) if small.contains(f) => len }.sum
    val tmp = new Path(path + "__compact_tmp")
    val old = new Path(path + "__compact_old")
    fs.delete(tmp, true)
    val mergedDir = new Path(tmp, "wave=-1")
    val rows =
      if (small.isEmpty) { fs.mkdirs(mergedDir); 0L }
      else {
        // Files read by explicit path lose the directory-derived wave
        // column — exactly right: every consolidated row re-homes under
        // the wave=-1 dir the write lands in.
        val df = spark.read.parquet(small.map(_.toString): _*)
        val n = df.count()
        val nOut = math.max(1L, (n + targetRows - 1) / targetRows).toInt
        df.repartition(nOut).write.mode("overwrite").parquet(mergedDir.toString)
        fs.delete(new Path(mergedDir, "_SUCCESS"), false)
        n
      }
    val rewritten = listData(fs, mergedDir).map(_._1.getName)
    // Kept big files join the merged partition by rename (their wave
    // value was directory-derived, so re-homing is a pure move); the
    // current wave's whole dir moves as one rename.
    val moves =
      big.map(f => f -> new Path(mergedDir, f.getName)) ++
        currentDirs.map(d => d.getPath -> new Path(tmp, d.getPath.getName))
    stageAndSwap(fs, p, tmp, old, moves)
    val after = dataFiles(fs, p)
    if (rewritten.nonEmpty) {
      val rowsBack = spark.read.parquet(
        rewritten.map(n => new Path(new Path(qp, "wave=-1"), n).toString): _*).count()
      require(rowsBack == rows,
        s"consolidateWaves: rewritten rows changed $rows -> $rowsBack at $path")
    }
    TieredStats(rows, bytes, before, after, rewritten.size, big.size)
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
