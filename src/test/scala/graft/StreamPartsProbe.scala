package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Probe: shuffle-partition sizing for the stateful streaming gates.
  *
  * The streaming gates pin `spark.sql.shuffle.partitions = 8` — a
  * small-SF choice (fewer state-store instances, less tiny-task
  * overhead at sf0.01/0.1). At sf10 the stream-stream interval join is
  * the most expensive gate on the rung (r15 cert 337.7 s, r16 min
  * 238.0 s), and 8 partitions on a 32-core box caps the stateful
  * stages' parallelism at 25%. Partition count cannot change RESULTS
  * (the join is key-partitioned whatever the count), only state layout
  * and parallelism — so if wider wins at scale, sizing the knob to the
  * input is the scale-correct design the gates should model.
  *
  * Run: `sbt 'Test/runMain graft.StreamPartsProbe <sfDir> [p1,p2,...]'`.
  */
object StreamPartsProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(8, 32))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = parts.map { p =>
      val ckpt = graft.util.Scratch.dir(s"graft_spp_ck$p")
      val out = graft.util.Scratch.dir(s"graft_spp_out$p") + "/t"
      val t0 = System.nanoTime()
      QueriesShared.withShufflePartitions(spark, p) {
        val q = graft.streaming.EventStreams
          .clickPurchaseJoin(graft.io.Tables.eventsStream(spark, dir),
            watermark = "2 hours")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // CONTENT invariance, not just cardinality: an order-insensitive
      // digest (count + sum of per-row xxhash64 over every column) —
      // two runs with equal counts but different rows cannot pass.
      val df = spark.read.parquet(out)
      val digest = df.select(
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.xxhash64(
            df.columns.map(col): _*)))
        .first().toSeq.map(String.valueOf).mkString(":")
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
      (p, sec, digest)
    }
    val digests = results.map(_._3).distinct
    require(digests.size == 1,
      s"partition count changed the RESULT content: $results")
    println(results.map { case (p, sec, _) =>
      s""""p$p":${"%.3f".format(sec)}"""
    }.mkString(s"""{"probe":"stream_parts","sf":"$dir","digest":"${digests.head}",""", ",", "}"))
    spark.stop()
  }
}
