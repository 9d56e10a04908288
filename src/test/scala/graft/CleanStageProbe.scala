package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-isolation probe for the `corpus_clean` gate (the most expensive
  * batch gate): times each armed tier of [[graft.text.CorpusPipeline.clean]]
  * in isolation, then the composed flow, and counts the Spark JOBS the
  * composed flow launches — at sf0.1 the input is ~0.6 MB, so the gate's
  * wall is fixed overhead (job rounds, shuffle stages, plan work), not
  * data; the probe says which term dominates. Not a test — run with
  * `sbt 'Test/runMain graft.CleanStageProbe [sfDir]'`.
  */
object CleanStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{Dedup, LanguageModel, SpanDedup, TextAnalysis}

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    // SPARK_GRAFT_PROBE_WIDE=1 widens the single-file scan to the core
    // count right after the read (guide §2.5: unsplittable-input fix) so
    // the A/B shows how much of each tier is the serial-scan bottleneck.
    val wide = sys.env.contains("SPARK_GRAFT_PROBE_WIDE")
    def docs = {
      val raw = spark.read.parquet(s"$dir/documents.parquet")
      if (wide) raw.repartition(32, col("doc_id")) else raw
    }
    docs.write.format("noop").mode("overwrite").save() // warm scan

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def time(name: String, reps: Int = 3)(f: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        cleanup()
        (dt, jobs.get() - j0)
      }
      val med = times.map(_._1).sorted.apply(reps / 2)
      println(f"[clean-probe] $name%-34s med ${med}%6.2f s  " +
        f"reps ${times.map(t => f"${t._1}%.2f").mkString("[", ",", "]")}  jobs ${times.head._2}")
    }

    time("scan+score (lang+quality)")(docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_guess"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("quality")))
    time("lm_unigram (raw corpus)")(LanguageModel.unigramSurprisal(
      docs, "doc_id", "text", maxDocTokens = QueriesText.LmDocTokenCap))
    time("lm_bigram (raw corpus)")(LanguageModel.bigramSurprisal(
      docs, "doc_id", "text", maxDocTokens = QueriesText.LmDocTokenCap))
    time("span_stats w=8 (raw corpus)")(SpanDedup.ngramSpanStats(
      docs, "doc_id", "text", QueriesText.SpanDedupW))
    val kept = docs.select(col("doc_id"), col("text"))
    time("exact collapse (window keeper)") {
      import org.apache.spark.sql.expressions.Window
      val keeperW = Window.partitionBy(col("fp"))
      kept.withColumn("fp", TextAnalysis.exactFingerprint(col("text")))
        .withColumn("keeper", min(col("doc_id")).over(keeperW))
        .where(col("doc_id") === col("keeper"))
        .select(col("doc_id"), col("text"))
    }
    time("jaccard pairs (index+self-join)") {
      val idx = Dedup.countedShingleIndex(kept, "doc_id", "text",
        n = 3, maxDocFreq = 100L).persist()
      Dedup.ngramJaccardPairsFromIndex(idx, 0.5)
    }
    time("prefix contained")(Dedup.prefixContainedDocs(kept, "doc_id", "text"))
    time("FULL corpus_clean")(Queries.queries("corpus_clean")(spark, dir))
    spark.stop()
  }
}
