package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Okapi BM25 retrieval scoring over the documents table — the ranking
  * half of a retrieval/contamination toolkit (the recall half is the
  * ANN family): score a fixed query set against every document, top-k
  * per query.
  *
  * Scale shape: the exploded token stream is filtered to the QUERY
  * TERMS before any aggregation (the per-(doc, term) tf shuffle carries
  * only documents containing query terms, not the corpus vocabulary);
  * document frequencies and the query-term table are broadcast; corpus
  * stats (N, Σdl) are a single-row broadcast attach. One shuffle for
  * tf, one for the per-(query, doc) score fold, one bounded window for
  * the top-k.
  *
  * Incremental maintenance: the index of a corpus SLICE is (tf, stats)
  * — tf one row per (doc, query term), stats one exact-integer row.
  * Slices over disjoint doc sets fold by tf APPEND + stats sum (df and
  * avgdl derive from the folded tables), so a growing corpus costs
  * O(batch) per fold and history is never re-tokenized — and the folded
  * scores are EXACTLY the full-rebuild scores, not an approximation.
  *
  * Determinism (every ranking input is cross-engine exact): N, df, tf,
  * dl are integers; avgdl = Σdl / N divides two exact integers in
  * double; idf = ln(1 + (N - df + 0.5)/(df + 0.5)) of exact rationals;
  * the per-(query, doc) score sums term contributions in TERM ORDER
  * (sorted collect + left fold — a bare sum() would be
  * partition-order-dependent in double); ties rank by doc_id.
  */
object Bm25 {

  /** Distinct terms of a (query_id, text) query set. */
  def queryTerms(queries: Seq[(String, String)]): Seq[String] =
    queries.flatMap(_._2.trim.split("\\s+")).distinct

  /** Index slice of `docs` for `terms`: (tf, stats).
    * tf: (doc_id, dl, term, tf) — only docs containing a term appear;
    * stats: ONE row (n_docs, sum_dl) over ALL docs of the slice
    * (document length norms count every document, matching or not).
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String]): (DataFrame, DataFrame) = {
    require(terms.nonEmpty, "buildIndex needs at least one term")
    val toks = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast(LongType)).as("sum_dl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    (tf, stats)
  }

  /** Fold any number of one-row slice stats into one exact row (zero
    * slices fold to exact zeros, not nulls). */
  def foldStats(statsSlices: DataFrame): DataFrame =
    statsSlices.agg(coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
      coalesce(sum("sum_dl"), lit(0L)).as("sum_dl"))

  /** Score `queries` against a (possibly folded) index. `stats` must be
    * the ONE-row folded form. Output: (query_id, rank, doc_id, score) —
    * score rounded to 6 for the cross-engine value compare, rank cut at
    * `k`, ties by doc_id.
    */
  def scoreIndex(tf: DataFrame, stats: DataFrame,
                 queries: Seq[(String, String)], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "scoreIndex needs at least one query")
    val spark = tf.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, text) => text.trim.split("\\s+").distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val dfTab = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val dlD = col("dl").cast(DoubleType)
    val tfD = col("tf").cast(DoubleType)
    val contrib = tf
      .join(broadcast(dfTab), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast(DoubleType) / col("n_docs").cast(DoubleType))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast(DoubleType) - col("df").cast(DoubleType) + 0.5) /
          (col("df").cast(DoubleType) + 0.5)))
      .withColumn("c", col("idf") * (tfD * lit(k1 + 1.0)) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * dlD / col("avgdl"))))

    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0d),
        (acc, x) => acc + x.getField("c")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("doc_id"), round(col("score"), 6).as("score"))
  }

  /** One-shot form: build the slice index and score it. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, stats) = buildIndex(docs, idCol, textCol, queryTerms(queries))
    scoreIndex(tf, stats, queries, k, k1, b)
  }
}
