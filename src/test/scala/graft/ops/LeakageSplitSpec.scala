package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.{Dedup, TextAnalysis}

/** The two cluster-keyed keeper policies: leakage-safe splitting (no
  * near-dup pair may straddle train/eval) and canonical-by-quality
  * selection (the kept copy is the best one, not the lowest id).
  */
class LeakageSplitSpec extends SparkSpec {
  import spark.implicits._

  // 30 near-dup pairs (base sentence vs base + two trailing stopwords —
  // trigram Jaccard 10/12, and the longer copy strictly higher quality on
  // stopword ratio + length factor) plus 30 singletons; every sentence
  // carries its own id token so no cross-pair similarity exists.
  private def corpus = {
    val pairs = (0 until 30).flatMap { i =>
      val base = s"unique token$i sentence about subject$i with many shared words in common order"
      Seq((i.toLong, base), (i + 100L, base + " is the"))
    }
    val singles = (0 until 30).map { i =>
      (i + 1000L, s"solitary document number$i holding entirely distinct vocabulary set$i only")
    }
    (pairs ++ singles).toDF("doc_id", "text")
  }

  private def labels = {
    val docs = corpus
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 100L)
    docs.select(col("doc_id"))
      .join(Dedup.clusterRepresentatives(docs.select(col("doc_id")), "doc_id", pairs),
        Seq("doc_id"))
  }

  test("cluster-keyed split: no near-dup pair straddles a split boundary") {
    val docs = corpus
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 100L)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 30) // every planted pair found, nothing else

    val safe = Sampling.hashSplit(labels, "rep",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        hashFn = graft.functions.Hashes.Md5Hash60)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    pairs.foreach { case (a, b) => assert(safe(a) == safe(b)) }

    // The per-doc split this replaces DOES leak: at least one planted pair
    // lands on different sides (deterministic under the fixed md5 hash).
    val naive = Sampling.hashSplit(docs.select(col("doc_id")), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        hashFn = graft.functions.Hashes.Md5Hash60)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) })
  }

  test("canonical-by-quality: the kept copy maximizes quality within its cluster") {
    val scored = labels.join(
      corpus.select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 6).as("quality")), Seq("doc_id"))
    val canonical = Windows.topKPerGroup(scored, Seq("rep"),
        Seq(col("quality").desc, col("doc_id").asc), k = 1)
      .select(col("rep"), col("doc_id").as("canonical_id"), col("quality"))

    val best = canonical.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val members = scored.collect().map(r => (r.getLong(1), r.getDouble(2)))
    // One canonical row per cluster; nobody in the cluster beats it.
    assert(canonical.count() == best.size)
    members.foreach { case (rep, q) => assert(best(rep) >= q) }
    // The longer near-dup copy scores strictly higher (length factor), so
    // the canonical of each planted pair is the i+100 variant, not min id.
    val canonIds = canonical.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 30).foreach { i => assert(canonIds(i.toLong) == i + 100L) }
  }
}
