package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe for the round-15 verdict question (carry-over #5): with three
  * statistical tiers armed, [[graft.text.CorpusPipeline.clean]] tokenizes
  * the raw corpus ~5 times per clean (scored0's scan expressions, the
  * unigram tf build, the bigram tf build, the span windower, and the span
  * stats' n_tokens recount). Would ONE cached `(doc_id, toks)` projection
  * feeding every tier beat the recompute? Each tier's own
  * recompute-beats-persist arithmetic is documented per-tier
  * (SpanDedup.scala's dupPositions scaladoc); the COMPOSED pipeline might
  * still cross the threshold, so this measures the primitive trade
  * directly and at identical consumption shape:
  *
  *   recompute: N passes, each re-tokenizing `text` and consuming the
  *              full token array (explode -> hash aggregate);
  *   cached:    persist `(doc_id, toks)` once (MEMORY_AND_DISK — a 100 TB
  *              corpus' token projection never fits memory), then the
  *              same N consume passes over the cached blocks.
  *
  * The composed `corpus_clean` wall is printed for context: the candidate
  * saving is (N-1) tokenization deltas; if that is small against the
  * composed wall — or the cache's own build+read cost eats it — the
  * recompute design stands, with numbers on record in SCALE.md.
  *
  * Run: `sbt 'Test/runMain graft.TokenShareProbe <sfDir> [nPasses]'`.
  */
object TokenShareProbe {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nPasses = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Raw read, not Tables.table: the probe also runs on RealisticCorpus
    // directories whose documents table is the (doc_id, text) subset and
    // would fail the full testdata schema assertion.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def consume(toks: org.apache.spark.sql.DataFrame): Unit = {
      // Full-array consumption, identical in both variants: explode to
      // one row per token, hash-aggregate — the shape the tf builders
      // and the span windower actually pay.
      // sum(length) rather than sum(xxhash64): ANSI mode (Spark 4
      // default) throws on the hash-sum's inevitable long overflow, and
      // length still forces every token string to materialize.
      toks.select(explode(col("toks")).as("t"))
        .agg(count(lit(1)), sum(length(col("t")))).collect()
      ()
    }
    val tokenized = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("toks"))

    // Warm-up (JIT + parquet footers), not timed.
    consume(tokenized)

    val recompute = (1 to nPasses).map(_ => time(consume(tokenized)))
    val cached = tokenized.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buildCache = time { cached.count() }
    val cachedReads = (1 to nPasses).map(_ => time(consume(cached)))
    cached.unpersist(blocking = true)

    val clean = time {
      graft.text.CorpusPipeline.clean(docs, "doc_id", "text",
          maxSurprisal = 12.0, maxBigramSurprisal = 14.0, spanDedupW = 8)
        .write.format("noop").mode("overwrite").save()
    }
    def j(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    println(s"""{"probe":"token_share","sf":"$dir","n_passes":$nPasses,""" +
      s""""recompute_pass_sec":${j(recompute)},""" +
      s""""cache_build_sec":${"%.3f".format(buildCache)},""" +
      s""""cached_pass_sec":${j(cachedReads)},""" +
      s""""recompute_total":${"%.3f".format(recompute.sum)},""" +
      s""""cached_total":${"%.3f".format(buildCache + cachedReads.sum)},""" +
      s""""corpus_clean_armed_sec":${"%.3f".format(clean)}}""")
    spark.stop()
  }
}
