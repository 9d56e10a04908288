package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage split for `streaming_heavy_hitters_live` (round-9 verdict #4):
  * the gate's wall decomposes into (a) the streaming summarize sink —
  * 3 waves, each a Misra–Gries batch sketch + one-row dynamic-overwrite
  * partition write, (b) the read-time one-level fold of the wave states
  * (O(waves·k), data-independent), (c) the exact resolve — one full
  * corpus recount against the broadcast candidates. Run at two scales
  * back-to-back in one JVM to attribute which stage carries the
  * last-decade growth. `sbt 'Test/runMain graft.HhLiveSplitProbe'`
  * (scales via args, default sf1 sf10).
  */
object HhLiveSplitProbe {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- scales; rep <- 1 to 2) {
      val ckpt = graft.util.Scratch.dir("graft_hhsplit_ck")
      val statePath = graft.util.Scratch.dir("graft_hhsplit_state") + "/state"
      val k = 120 * 16
      // (a0) fixture staging (eager inside wavedEventsStream: min/max
      // collect + range shuffle + one single-file write per wave) vs
      // (a1) the actual streaming execution.
      val (staged, tStage) = timed {
        graft.io.Tables.wavedEventsStream(spark, dir, nWaves = 3)
          .select(col("user_id"))
      }
      val (_, tSink) = timed {
        graft.QueriesShared.withShufflePartitions(spark, 8) {
          graft.streaming.EventStreams.heavyHittersSink(
            staged, "user_id", k, statePath, ckpt).awaitTermination()
        }
      }
      // (a') non-streaming control: the same 3 summarize+write rounds
      // over static thirds — isolates micro-batch machinery overhead
      // from the sketch + write work itself.
      val statePath2 = graft.util.Scratch.dir("graft_hhsplit_state2") + "/state"
      val (_, tBatchTwin) = timed {
        val ev = graft.io.Tables.events(spark, dir).select(col("user_id"))
        for (w <- 0 until 3)
          graft.ops.Profile.hhSummarize(
              ev.where(pmod(col("user_id") + lit(w), lit(3)) === 0), "user_id", k)
            .withColumn("wave", lit(w))
            .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
            .partitionBy("wave").parquet(statePath2)
      }
      // (b) fold of the 3 one-row states
      val (folded, tFold) = timed {
        val f = graft.ops.Profile.hhMergeAll(
          spark.read.parquet(statePath).select(col("cand"), col("total"), col("nulls")),
          k)
        f.head(); f
      }
      // (c) exact resolve recount over the full corpus
      val (n, tResolve) = timed {
        graft.ops.Profile.hhResolve(
          graft.io.Tables.events(spark, dir).select(col("user_id")),
          folded, "user_id", num = 1L, den = 120L).count()
      }
      println(f"HHSPLIT dir=$dir rep=$rep stage=$tStage%.2f sink=$tSink%.2f " +
        f"batchTwin=$tBatchTwin%.2f fold=$tFold%.2f resolve=$tResolve%.2f hitters=$n")
    }
    spark.stop()
  }
}
