package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Regenerates PLANS.md (`sbt 'Test/runMain graft.PlanDump'`): condensed
  * executedPlan dumps for the headline queries, tying each SCALE.md claim
  * to actual plan text. Run after any plan-shaping change.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val picks = Seq(
      "q1_agg" -> "partial map-side aggregation; scan pruned to 4 of 11 lineitem columns",
      "filter_golden_row" -> "predicate pushed to the parquet scan (PushedFilters)",
      "join_fk_resolve" -> "dim side broadcast: no shuffle of the fact side",
      "sql_revenue_rollup" -> "two broadcast joins + single partial-agg shuffle",
      "window_topk_quarters" -> "WindowGroupLimit: O(k) retained per group during sort",
      "sim_brute_topk_agg" -> "bounded-heap partial top-k BEFORE the exchange",
      "unpivot_wide_long" -> "Expand, zero shuffles",
      "sample_hash_split" -> "scan-side only: no exchange, no window",
      "text_top_tokens" -> "TakeOrderedAndProject (map-side partial top-k) + k^2 rank join",
      "dedup_embedding_lsh" -> "one-pass fused graft_lsh_buckets assignment; codegen'd graft_dot verify",
      "merge_upsert" -> "MERGE = one window shuffle on the natural key",
      "text_repetition" -> "repetition signals scan-side: single-pass kernels, zero shuffles",
      "vec_quantize_int8" -> "int8 quantization: one codegen'd pass over the scan",
      "interval_join_sessions" -> "range join as (key, bin) EQUI-join — hash exchanges, no theta explosion",
      "join_bucketed" -> "bucketed scan both sides: no Exchange before the join",
      "profile_orders" -> "multi-distinct Expand stays HashAggregate; var-width min/max in keyless side agg",
      "sim_quantized_rescore" -> "int8 recall tier + float rescore: codegen'd graft_dot on code arrays, broadcast queries",
      "pack_chunks" -> "shard-local running sums: ONE hash exchange, no global single-partition window",
      "incremental_quantiles" -> "HDR sketch: integer bucket expr scan-side, per-key windows only, no global sort",
      "recall_embedding_lsh" -> "recall audit: both tiers, exact O(n^2) declared + inline-verified LSH",
      "dedup_simhash" -> "banding + pair dedup over UNIQUE fingerprints; identical sketches via fingerprint equi-join",
      "dedup_ngram_jaccard" -> "exact-collapsed: quadratic self-join over unique texts, expansion joins restore doc pairs",
      "dedup_incremental" -> "batch vs persisted rep-index state: equi-joins only, no history re-pairing",
      "sample_mixture" -> "group counts once, then a pure scan-side hash-threshold filter",
      "jdbc_roundtrip" -> "partitioned JDBC scan: 4 range slices, aggregate above",
      "source_http_dsv2" -> "DSv2 REST source: symbol predicates consumed as partition pruning, required columns pruned into the record parser (scan description)",
      "sample_split_leakage_safe" -> "cluster-keyed split: md5 bucket is ONE scan-side projection over the persisted label table, zero exchanges",
      "dedup_canonical_quality" -> "canonical-by-quality: WindowGroupLimit on (quality DESC, doc_id) per cluster",
      "recall_embedding_lsh_sampled" -> "sampled audit: the hash-sample filter sits UNDER both tiers, pair cost falls quadratically",
      "dedup_cluster_reps_incremental" -> "incremental CC fold: relabel = equi-joins through the contracted-graph labels, history table never re-clustered",
      "profile_heavy_hitters" -> "heavy hitters: MG sketch partial-aggregates map-side (<= k counters per partition on the wire); pass 2 recounts only the broadcast candidates",
      "incremental_heavy_hitters" -> "incremental HH resolve: broadcast semi-join of the folded state's candidates, pre-resolved count threshold (no total re-attach)",
      "sim_ivf_kmeans" -> "learned-cell IVF: graft_nearest_centroid assignment is ONE scan-side kernel call (the composed form fell out of codegen), probes broadcast",
      "text_bm25_topk" -> "BM25: tf shuffle filtered to query terms before aggregation; df + stats broadcast; term-ordered score fold",
      "dedup_prefix_contained" -> "ONE full-text shuffle (duplicate runs collapse inside the range sort — no distinct exchange); per-range successor window; (xxhash64,len)-keyed corpus re-join",
      "dedup_suffix_contained" -> "suffix containment = the prefix shape over reverse(text): same single range shuffle, run-collapsing window, narrow-key re-join",
      "text_dup_lines" -> "dup-line repetition signals: one codegen'd graft_line_dup_stats kernel call per row, zero exchanges",
      "text_lm_surprisal" -> "unigram-LM surprisal: tf + term-count shuffles (narrow rows), one-row vocab/total broadcast, per-doc term-ordered fold in a hash aggregate",
      "corpus_clean" -> "composed cleaning flow: post-exact frame lineage-truncated (Scan ExistingRDD — the ~1 MB composed plan cost ~25% of the gate in per-action re-analysis), shingle index persisted once (InMemoryRelation), LM tiers execute inside the truncated subplan (vocab row broadcast — pinned on the composed plan in PlanContractSpec), no cartesian anywhere",
      "text_lm_bigram" -> "order-1 LM: per-pair model (counts + context totals + lnP) folded on the vocabulary-sized side, the big (doc, w1, w2) tf crosses ONE join; vocab row broadcast",
      "dedup_ngram_spans" -> "exact-substring spans: 20-byte window fingerprints on every exchange (never window text), multiset scan pruned to the text column, per-doc interval-union fold map-side partial")
    val keep = Seq("Exchange", "Scan", "Join", "Aggregate", "Window", "Expand",
      "TakeOrdered", "Broadcast", "Sort", "Filter", "Project", "WholeStageCodegen")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence for the headline scale claims\n\n")
    sb.append("Generated from `.queryExecution.executedPlan` at sf0.001 (plan shapes are\n")
    sb.append("data-size independent below AQE thresholds); operator lines only, trimmed.\n")
    sb.append("Regenerate: `sbt 'Test/runMain graft.PlanDump'`, or ad hoc via\n")
    sb.append("`graft.Queries.queries(name)(spark, sfDir).explain(\"formatted\")`.\n")
    picks.foreach { case (n, claim) =>
      sb.append(s"\n## $n — $claim\n\n```\n")
      val plan = Queries.queries(n)(spark, dir).queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => keep.exists(l.contains))
        .map(_.take(150))
        .take(22)
        .foreach(l => sb.append(l).append('\n'))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("PLANS.md regenerated")
    spark.stop()
  }
}
