package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus unigram language-model quality scoring — the statistical LM
  * filter every large-scale corpus pipeline runs (CCNet-style, reduced
  * to its order-0 form): fit P(t) over the corpus itself with add-one
  * smoothing, then score each document by the average negative
  * log-likelihood (surprisal) of its tokens. Fluent in-domain text
  * scores low; vocabulary-foreign or token-salad text scores high —
  * a corpus-relative signal the per-document heuristics
  * ([[TextAnalysis.qualityScore]]) cannot see.
  *
  * Scale shape: one (doc, term) tf shuffle (map-side combined to
  * distinct doc-terms per partition) + one term-count aggregation over
  * the tf rows, then a term-keyed equi-join of the two — both narrow;
  * the vocabulary/total attach is a single broadcast row. No
  * all-pairs, no driver state, no vocabulary collect.
  *
  * Determinism (cross-engine exact): P(t) = (cnt_t + 1) / (total + V)
  * divides exact integers in double; each document's log-prob folds
  * tf_dt · ln P(t) over its DISTINCT terms in TERM ORDER (sorted
  * collect + left fold, the [[Bm25]] trick) so the double sum is
  * partition-order independent; the average rounds to 6.
  */
object LanguageModel {

  /** (doc_id, n_tokens, avg_neg_logprob) for every document —
    * surprisal under the corpus' own add-one-smoothed unigram LM.
    * Empty/blank documents score 0.0 (no evidence, not infinite
    * surprise) with n_tokens 0.
    *
    * `cache` governs the (doc, term) tf table — it feeds THREE
    * consumers (the term-count aggregation, the one-row vocab/total
    * attach through it, and the contrib join's probe side). Without a
    * persist the explode+groupBy re-executes per consumer AND the
    * term-count side loses its small-relation estimate (the join
    * degrades from broadcast to a 25 M-row sort-merge at sf10):
    * measured 229 s end-to-end vs ~21 s with the persist at 500 k docs
    * (`LmFoldProbe` splits the stages).
    *
    * Memory bound of the per-doc fold: `collect_list(struct(term, lp))`
    * buffers ONE document's DISTINCT-term list on the task that owns
    * its group — bounded by per-document vocabulary, the same contract
    * as [[Bm25.scoreIndex]]'s fold (there the buffer is query terms,
    * here it is doc vocabulary). Fine for web-document corpora (vocab
    * ≪ heap); a single pathological multi-GB document would
    * concentrate one group's buffer on one task, so `maxDocTokens > 0`
    * caps the evidence window: each document is scored over its FIRST
    * `maxDocTokens` tokens (and contributes only those to the LM fit),
    * bounding the buffer by min(doc vocab, maxDocTokens). 0 = uncapped.
    * [[CorpusPipeline.clean]] passes its length-tier cap through here.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                       cache: DataFrame => DataFrame =
                         graft.util.CacheScope.untracked,
                       maxDocTokens: Int = 0): DataFrame = {
    val allToks = TextAnalysis.tokens(col(textCol))
    val capped =
      if (maxDocTokens > 0) slice(allToks, 1, maxDocTokens) else allToks
    val toks = docs.select(col(idCol).as("doc_id"), capped.as("toks"))
    val tf = cache(toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")))
    val counts = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val vt = counts.agg(count(lit(1)).as("v"), coalesce(sum(col("cnt")), lit(0L)).as("total"))
    val lnP = log((col("cnt").cast(DoubleType) + lit(1.0)) /
      (col("total").cast(DoubleType) + col("v").cast(DoubleType)))
    val contrib = tf.join(counts, "term").crossJoin(broadcast(vt))
      .withColumn("lp", col("tf").cast(DoubleType) * lnP)
    val perDoc = contrib.groupBy(col("doc_id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("term"), col("lp")))),
          lit(0.0d),
          (acc, x) => acc + x.getField("lp")).as("s"),
        sum(col("tf")).as("n"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n"), lit(0L)) > 0,
          round(-col("s") / col("n").cast(DoubleType), 6))
          .otherwise(lit(0.0)).as("avg_neg_logprob"))
  }
}
