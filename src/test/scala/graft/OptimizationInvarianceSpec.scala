package graft

import graft.SparkSpec

/** Round-17 optimization invariance: the two perf rewrites — conditional
  * scan widening (`QueriesShared.widen`) and lineage truncation
  * (`CacheScope.truncate`) — are pure throughput changes, so every gate
  * they touch must produce BIT-IDENTICAL rows with the optimizations
  * disabled through their escape hatches. This pins the claim the A/B
  * harness relies on (and the oracle re-proves externally) inside the
  * suite, so a future edit that makes either path result-affecting fails
  * here first.
  */
class OptimizationInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(name: String): Seq[String] =
    Queries.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  private def withDisabled[T](f: => T): T = {
    sys.props("spark.graft.noWiden") = "1"
    sys.props("spark.graft.noPlanCut") = "1"
    try f
    finally {
      sys.props.remove("spark.graft.noWiden")
      sys.props.remove("spark.graft.noPlanCut")
      ()
    }
  }

  // One gate per adopted-optimization family: widening only (spans),
  // truncation only (minhash/recall/incremental), both (corpus_clean).
  for (gate <- Seq("corpus_clean", "dedup_ngram_spans", "dedup_minhash_lsh",
      "recall_minhash_lsh", "dedup_incremental", "dedup_simhash")) {
    test(s"$gate: widening + lineage truncation never change a row") {
      val optimized = sortedRows(gate)
      val plain = withDisabled(sortedRows(gate))
      assert(optimized == plain,
        s"$gate rows differ between optimized and escape-hatch paths")
    }
  }
}
