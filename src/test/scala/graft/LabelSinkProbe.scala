package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the `streaming_cluster_labels_live` gate — the
  * single largest bench line. Splits its wall three ways on the same
  * session and fixture:
  *   1. `stream`: the gate as shipped (Structured Streaming foreachBatch
  *      over the two staged waves);
  *   2. `direct`: the identical per-wave fold driven by calling
  *      [[graft.streaming.EventStreams.labelWave]] directly — no
  *      micro-batch machinery, no checkpoint, no file-source listing;
  *   3. per-stage walls inside each direct wave (index build, pair gen,
  *      prior-label reconstruction, CC fold, state writes), probe-forced
  *      on persisted frames.
  * stream − direct = Structured Streaming fixed overhead; the stage rows
  * show where the fold itself spends. Run before/after any fold change.
  */
object LabelSinkProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8") // the gate's setting
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms[T](f: => T): Long = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1000000L
    }
    val docs = io.Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    // Warm the scan cache AND the JIT once so neither measured path pays
    // first-touch costs: a full throwaway direct fold first.
    docs.count()
    val warmState = graft.util.Scratch.dir("graft_lblp_w_state") + "/index"
    val warmLbl = graft.util.Scratch.dir("graft_lblp_w_lbl") + "/labels"
    (0 until 2).foreach { w =>
      graft.streaming.EventStreams.labelWave(
        docs.where(pmod(col("doc_id"), lit(2)) === w), "doc_id", "text", w,
        warmState, warmLbl)
    }

    // ---- path 1: the gate as shipped --------------------------------------
    val tStream = ms {
      val waveDir = io.Tables.stageWaves(spark, docs, pmod(col("doc_id"), lit(2)), 2, "graft_lblp_s")
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(waveDir)
      graft.streaming.EventStreams.corpusLabelSink(stream, "doc_id", "text",
        graft.util.Scratch.dir("graft_lblp_s_state") + "/index",
        graft.util.Scratch.dir("graft_lblp_s_lbl") + "/labels",
        graft.util.Scratch.dir("graft_lblp_s_ck")).awaitTermination()
    }

    // ---- path 2: the identical fold, driven directly ----------------------
    val statePath = graft.util.Scratch.dir("graft_lblp_d_state") + "/index"
    val labelsPath = graft.util.Scratch.dir("graft_lblp_d_lbl") + "/labels"
    val waves = (0 until 2).map(w => docs.where(pmod(col("doc_id"), lit(2)) === w))
    val tDirect = ms {
      waves.zipWithIndex.foreach { case (b, w) =>
        graft.streaming.EventStreams.labelWave(b, "doc_id", "text", w,
          statePath, labelsPath)
      }
    }

    // ---- path 3: per-stage split (fresh state dir, probe-forced) ----------
    val statePath2 = graft.util.Scratch.dir("graft_lblp_p_state") + "/index"
    val labelsPath2 = graft.util.Scratch.dir("graft_lblp_p_lbl") + "/labels"
    val stages = scala.collection.mutable.LinkedHashMap[String, Long]()
    // SPARK_GRAFT_PROBE_WIDE: widen each wave batch before the fold —
    // the A/B for parallelizing the single-file batch's scan chain.
    val wideBatch: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      if (sys.env.contains("SPARK_GRAFT_PROBE_WIDE")) _.repartition(32) else identity
    val tProbe = ms {
      waves.zipWithIndex.foreach { case (b, w) =>
        graft.streaming.EventStreams.labelWave(wideBatch(b), "doc_id", "text", w,
          statePath2, labelsPath2,
          probeStages = Some((s, t) => stages(s) = t))
      }
    }
    val stageJson = stages.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"probe":"label_sink","dir":"$dir","stream_ms":$tStream,""" +
      s""""direct_ms":$tDirect,"probe_ms":$tProbe,""" +
      s""""overhead_ms":${tStream - tDirect},"stages":{$stageJson}}""")
    spark.stop()
  }
}
