package graft

import graft.SparkSpec

/** Optimization invariance (rounds 17-18): the perf rewrites — conditional
  * scan widening (`QueriesShared.widen`), lineage truncation
  * (`CacheScope.truncate`), and round-18's shared LM tokenization
  * (`CorpusPipeline`) — are pure throughput changes, so every gate they
  * touch must produce BIT-IDENTICAL rows with the optimizations disabled
  * through their escape hatches. This pins the claim the A/B harness
  * relies on (and the oracle re-proves externally) inside the suite, so a
  * future edit that makes any path result-affecting fails here first.
  */
class OptimizationInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(name: String): Seq[String] =
    Queries.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  private def withProps[T](props: String*)(f: => T): T = {
    props.foreach(p => sys.props(p) = "1")
    try f
    finally props.foreach { p => sys.props.remove(p); () }
  }

  private def withDisabled[T](f: => T): T =
    withProps("spark.graft.noWiden", "spark.graft.noPlanCut",
      "spark.graft.noLmShare")(f)

  // One gate per adopted-optimization family — plus every widened gate
  // (round-17 advice: corpus_filter_report and dedup_ngram_spans_clean
  // adopted widening but were missing, so a widening edit result-affecting
  // only there would have passed the suite and failed only at the oracle).
  for (gate <- Seq("corpus_clean", "corpus_filter_report",
      "dedup_ngram_spans", "dedup_ngram_spans_clean", "dedup_minhash_lsh",
      "recall_minhash_lsh", "dedup_incremental", "dedup_simhash")) {
    test(s"$gate: widening + truncation + LM sharing never change a row") {
      val optimized = sortedRows(gate)
      val plain = withDisabled(sortedRows(gate))
      assert(optimized == plain,
        s"$gate rows differ between optimized and escape-hatch paths")
    }
  }

  // Third truncation mode (round-17 verdict #6): the cluster-deployment
  // escape routes the same cut through reliable checkpoint() instead of
  // localCheckpoint() — rows must be identical there too.
  for (gate <- Seq("corpus_clean", "dedup_minhash_lsh")) {
    test(s"$gate: reliable-checkpoint mode produces identical rows") {
      val local = sortedRows(gate)
      val reliable =
        withProps("spark.graft.reliableCheckpoint")(sortedRows(gate))
      assert(local == reliable,
        s"$gate rows differ between localCheckpoint and reliable checkpoint")
    }
  }
}
