package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data cleaning flow — the flagship beyond-reference
  * pipeline: language filter -> quality filter -> exact-dedup keeper ->
  * near-dup keeper. Every stage is one of the library's scan-side
  * expressions or index joins, so the whole flow is a single lazy plan.
  *
  * Keeper policy (deterministic): within an exact-duplicate group the
  * smallest doc_id survives; among near-dup pairs (Jaccard >= threshold)
  * the larger doc_id is dropped (transitively this keeps each near-dup
  * cluster's smallest id surviving against its direct pairs).
  */
object CorpusPipeline {

  /** Returns the surviving documents (doc_id + text + diagnostics). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            lang: String = "en", minQuality: Double = 0.3,
            jaccardThreshold: Double = 0.5, maxDocFreq: Long = 100L): DataFrame = {
    val scored = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      TextAnalysis.langId(col(textCol)).as("lang_guess"),
      round(TextAnalysis.qualityScore(col(textCol)), 6).as("quality"))
    val kept = scored.where(col("lang_guess") === lang && col("quality") >= minQuality)

    // Exact-dup losers: every doc whose fingerprint group keeper isn't it.
    val fp = kept.select(col("doc_id"),
      TextAnalysis.exactFingerprint(col("text")).as("fp"))
    val exactLosers = fp
      .join(fp.groupBy("fp").agg(min(col("doc_id")).as("keeper")), "fp")
      .where(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"))

    val afterExact = kept.join(exactLosers, Seq("doc_id"), "left_anti")

    // Near-dup losers: the larger id of each surviving pair.
    val nearLosers = Dedup.ngramJaccardPairs(
        afterExact.select(col("doc_id"), col("text")), "doc_id", "text",
        n = 3, threshold = jaccardThreshold, maxDocFreq = maxDocFreq)
      .select(col("doc_b").as("doc_id")).distinct()

    afterExact.join(nearLosers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_guess"), col("quality"))
  }
}
