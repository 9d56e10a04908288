package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Probe: state-store BACKEND for the stateful streaming gates
  * (round-17 verdict "Next round" #1 — the top named cost).
  *
  * The stream-stream interval join holds 4 state-store providers per
  * shuffle partition; at sf10 (32 partitions) the residual cost named by
  * the r16/r17 verdicts is HDFSBackedStateStore churn — every commit
  * rewrites the full in-memory map to a delta file, and maintenance
  * snapshots copy it. RocksDB
  * (`spark.sql.streaming.stateStore.providerClass`) is the guide-§5
  * alternative: state lives off-heap in an LSM tree with changelog-style
  * commits. The backend CANNOT change results — the store is a key-value
  * map behind the same operator semantics — which the probe enforces with
  * an order-insensitive content digest per gate across backends.
  *
  * Run: `sbt 'Test/runMain graft.StateStoreProbe <sfDir> [gates] [providers] [reps]'`
  * gates: comma list of `live`/`late` (default both);
  * providers: comma list of `hdfs`/`rocksdb` (default both).
  */
object StateStoreProbe {

  private val Providers = Map(
    "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // RocksDB with changelog checkpointing: commits upload a changelog
    // instead of a full snapshot — the fairness variant for few-batch
    // AvailableNow runs where snapshot cost dominates.
    "rocksdb_cl" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private val ExtraConfs = Map(
    "rocksdb_cl" -> Seq(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gates = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("live", "late"))
    val providers = args.lift(2).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("hdfs", "rocksdb"))
    val reps = args.lift(3).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runGate(gate: String, ckpt: String, out: String): Unit = {
      val (stream, wm) = gate match {
        case "live" => (graft.io.Tables.eventsStream(spark, dir), "2 hours")
        case "late" => (graft.io.Tables.lateWavedEventsStream(spark, dir, nWaves = 4),
          "96 hours")
        case other => sys.error(s"unknown gate $other")
      }
      QueriesShared.withShufflePartitions(spark,
        QueriesShared.streamParts(spark, dir)) {
        val q = graft.streaming.EventStreams
          .clickPurchaseJoin(stream, watermark = wm)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination()
      }
    }

    val results = for {
      gate <- gates
      prov <- providers
      rep <- 1 to reps
    } yield {
      val cls = Providers.getOrElse(prov, prov)
      val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      ExtraConfs.getOrElse(prov, Nil).foreach { case (k, v) => spark.conf.set(k, v) }
      val ckpt = graft.util.Scratch.dir(s"graft_ssp_${gate}_${prov}_${rep}_ck")
      val out = graft.util.Scratch.dir(s"graft_ssp_${gate}_${prov}_$rep") + "/t"
      val t0 = System.nanoTime()
      runGate(gate, ckpt, out)
      val sec = (System.nanoTime() - t0) / 1e9
      prevProv match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      // CONTENT invariance across backends: order-insensitive digest
      // (count + sum of per-row xxhash64 over every column). The sum
      // runs in DECIMAL(38,0): ANSI mode (Spark 4 default) throws on
      // the long overflow a hash sum over 10M+ rows is certain to hit.
      val df = spark.read.parquet(out)
      val digest = df.select(
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.xxhash64(
            df.columns.map(col): _*).cast(
            org.apache.spark.sql.types.DecimalType(38, 0))))
        .first().toSeq.map(String.valueOf).mkString(":")
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
      System.gc()
      (gate, prov, rep, sec, digest)
    }
    gates.foreach { g =>
      val ds = results.filter(_._1 == g).map(_._5).distinct
      require(ds.size == 1,
        s"state-store backend changed gate $g's RESULT content: $results")
    }
    println(results.map { case (g, p, r, sec, _) =>
      s""""${g}_${p}_$r":${"%.3f".format(sec)}"""
    }.mkString(s"""{"probe":"state_store","sf":"$dir","digest_ok":true,""", ",", "}"))
    spark.stop()
  }
}
