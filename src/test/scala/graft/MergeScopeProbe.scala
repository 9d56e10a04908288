package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Demonstrates WHEN the partition-scoped merge beats the full-table
  * swap: a standing state far larger than the batch. 2 M-row state over
  * 100 hive partitions; a 20 k-row batch touching 2 of them. The
  * full-swap path must read+rewrite all 2 M rows; the scoped path reads
  * and rewrites ~2 % of them. (At the driver-fixture scale the state is
  * tiny and the two sinks measure at parity — THIS is the regime the
  * scoped form exists for.)
  */
object MergeScopeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Merge
    def ms[T](f: => T): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000L
    }
    val keys = Seq("k")
    val prec = Seq(col("v").desc)
    def freshState(path: String): Unit =
      spark.range(2000000)
        .select(col("id").as("k"), (col("id") % 100).as("p"), lit(0L).as("v"))
        .write.partitionBy("p").parquet(path)
    val batch = spark.range(20000)
      .select(col("id").as("k"),
        when(col("id") % 2 === 0, lit(3L)).otherwise(lit(7L)).as("p"),
        lit(1L).as("v"))
      .persist()
    batch.count()

    // Warm both paths once on throwaway state dirs (JIT + committer).
    val w1 = graft.util.Scratch.dir("graft_scope_w1") + "/state"
    freshState(w1)
    Merge.mergeIntoPartitionedState(spark, w1, batch, keys, prec, "p")
    val w2 = graft.util.Scratch.dir("graft_scope_w2") + "/state"
    freshState(w2)

    val scopedPath = graft.util.Scratch.dir("graft_scope_a") + "/state"
    freshState(scopedPath)
    val tScoped = ms(
      Merge.mergeIntoPartitionedState(spark, scopedPath, batch, keys, prec, "p"))

    val swapPath = graft.util.Scratch.dir("graft_scope_b") + "/state"
    freshState(swapPath)
    val tSwap = ms {
      val current = spark.read.parquet(swapPath)
        .select(batch.columns.map(col): _*)
      graft.io.Sinks.atomicSwapWrite(spark,
        Merge.mergeUpsert(current, batch, keys, prec), swapPath)
    }
    val nScoped = spark.read.parquet(scopedPath).where(col("v") === 1).count()
    val nSwap = spark.read.parquet(swapPath).where(col("v") === 1).count()
    println(s"""{"probe":"merge_scope","state_rows":2000000,"batch_rows":20000,""" +
      s""""scoped_ms":$tScoped,"swap_ms":$tSwap,"updated_scoped":$nScoped,"updated_swap":$nSwap}""")
    require(nScoped == 20000 && nSwap == 20000, "merge results diverged")
    spark.stop()
  }
}
