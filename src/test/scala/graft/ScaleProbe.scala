package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale probe (`sbt 'Test/runMain graft.ScaleProbe'`): replicates
  * the sf0.1 documents corpus 4x (with id offsets, so every doc gains 3
  * exact duplicates) and runs the dedup/cleaning path at 20k docs —
  * checks wall time and that pair counts stay bounded (the hot-shingle
  * cap and banding doing their job at growing scale).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = docs0.count()
    val docs = (0 until 4).map(i =>
        docs0.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    docs.cache(); val n = docs.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val exact = time("exact_dups") {
      text.Dedup.exactDuplicates(docs, "doc_id", "text").where(col("cnt") > 1).count()
    }
    val jac = time("ngram_jaccard") {
      text.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 100L).count()
    }
    val mh = time("minhash_lsh") {
      text.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 0.5, maxDocFreq = 100L).count()
    }
    val clean = time("corpus_clean") {
      text.CorpusPipeline.clean(docs, "doc_id", "text", minQuality = 0.45).count()
    }
    // Sampling / contamination on the replicated corpus: split counts must
    // track weights, and every benchmark doc (the original corpus) must
    // report its 4 replicas as matches.
    val splitCnt = time("hash_split") {
      ops.Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
        .where(col("split") === "val").count()
    }
    val contaminated = time("contamination") {
      text.Dedup.contaminationReport(docs, "doc_id", "text",
          docs0.select(col("doc_id"), col("text")), "doc_id", "text")
        .where(col("n_matches") >= 4).count()
    }
    println(s"PROBE docs=$n (x4 of $n0) exact_groups=$exact jaccard_pairs=$jac " +
      s"minhash_pairs=$mh survivors=$clean val_split=$splitCnt " +
      s"contaminated=$contaminated/$n0")

    // Round-3 operators at amplified scale: packing over the replicated
    // corpus (shard-local windows — cost must grow linearly), interval
    // join with a HOT key (one user owning 25% of events — the shape a
    // theta join explodes on), and quantization throughput over a
    // replicated embedding corpus.
    val packed = time("pack_chunks_x4") {
      ops.Packing.chunkAssignments(docs, "doc_id",
        text.TextAnalysis.tokenCount(col("text")), maxTokens = 512, nShards = 8)
        .agg(max(col("end_chunk"))).collect().head.getLong(0)
    }
    val ev0 = io.Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("user_id"), col("event_id"), col("ts"))
    // Hot key: fold 25% of events onto user -1.
    val evHot = ev0.select(
      when(col("event_id") % 4 === 0, lit(-1L)).otherwise(col("user_id")).as("user_id"),
      col("event_id"), col("ts")).cache()
    evHot.count()
    val intervals = evHot.groupBy("user_id")
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      .select(col("user_id"), col("s"), col("e"))
    val ijCnt = time("interval_join_hotkey") {
      ops.RangeJoin.intervalJoin(evHot, intervals, Seq("user_id"),
        "ts", "s", "e", binWidth = 6L * 3600L * 1000000L).count()
    }
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val embBig = (0 until 8).map(i =>
        emb0.select((col("vec_id") + lit(i * 1000000)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val qCnt = time("int8_quantize_x8") {
      embBig.select(functions.VectorExpressions.int8Quantize(col("embedding")).as("q"))
        .where(col("q.scale") >= 0).count()
    }
    println(s"PROBE pack_max_chunk=$packed interval_join_rows=$ijCnt quantized=$qCnt")

    // Skew probe: a pathological hot key (half of all rows on ONE key)
    // joined to a small build side, plain vs salted, AQE off so the
    // salting itself — not AQE's skew splitting — carries the load. The
    // salted result must be identical; wall times show the spread.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = spark.range(40000000).select(
        when(col("id") % 2 === 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
      val build = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("dim"))
      // Aggregate AFTER the join so the hot key's 20M joined rows are
      // work the owning task must actually do, as in a real pipeline.
      val plainCnt = time("skew_plain_join") {
        probe.join(build, Seq("k"))
          .groupBy("k").agg(sum(col("payload") * col("dim"))).count()
      }
      val saltedCnt = time("skew_salted_join") {
        ops.Skew.saltedJoin(probe, build, Seq("k"), buckets = 8)
          .groupBy("k").agg(sum(col("payload") * col("dim"))).count()
      }
      println(s"PROBE skew plain=$plainCnt salted=$saltedCnt identical=${plainCnt == saltedCnt}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    spark.stop()
  }
}
