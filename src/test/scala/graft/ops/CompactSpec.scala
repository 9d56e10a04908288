package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compactParquet: rows and content preserved, file count bounded") {
    val path = graft.util.Scratch.dir("compact_flat") + "/t"
    spark.range(0, 10000).select(col("id"), (col("id") % 7).as("k"))
      .repartition(40).write.parquet(path)
    val before = spark.read.parquet(path).orderBy("id").collect()
    val stats = Compact.compactParquet(spark, path)
    assert(stats.rows === 10000L)
    assert(stats.filesBefore === 40)
    assert(stats.filesAfter === 1)
    val after = spark.read.parquet(path).orderBy("id").collect()
    assert(after === before)
  }

  test("compactParquet: targetRows bounds output file count from below") {
    val path = graft.util.Scratch.dir("compact_target") + "/t"
    spark.range(0, 9000).repartition(30).write.parquet(path)
    val stats = Compact.compactParquet(spark, path, targetRows = 4000L)
    assert(stats.filesAfter === 3) // ceil(9000 / 4000)
  }

  test("compactParquet: hive partition layout survives (streaming wave state)") {
    val path = graft.util.Scratch.dir("compact_part") + "/t"
    // Three "waves" of 8 files each — the shape corpusDedupSink's
    // per-micro-batch appends leave behind.
    (0 until 3).foreach { w =>
      spark.range(w * 1000, (w + 1) * 1000)
        .withColumn("wave", lit(w)).repartition(8)
        .write.mode("append").partitionBy("wave").parquet(path)
    }
    val before = spark.read.parquet(path).orderBy("id").collect()
    val stats = Compact.compactParquet(spark, path, partitionCols = Seq("wave"))
    assert(stats.rows === 3000L)
    assert(stats.filesBefore === 24)
    assert(stats.filesAfter <= 3) // at most one file per wave here
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until 3).foreach { w =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(path, s"wave=$w")),
        s"wave=$w partition dir lost by compaction")
    }
    // Wave-keyed reads (the sinks' replay-safety filter) still work.
    val after = spark.read.parquet(path).orderBy("id").collect()
    assert(after === before)
    assert(spark.read.parquet(path).where(col("wave") === 1).count() === 1000L)
  }

  test("compactParquet: refuses a missing table") {
    val missing = graft.util.Scratch.dir("compact_missing") + "/nope"
    val e = intercept[IllegalArgumentException] {
      Compact.compactParquet(spark, missing)
    }
    assert(e.getMessage.contains("no table at"))
  }
}
