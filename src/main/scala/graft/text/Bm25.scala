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
  * Determinism (every ranking input is cross-engine exact): N, df, tf,
  * dl are integers; avgdl = Σdl / N divides two exact integers in
  * double; idf = ln(1 + (N - df + 0.5)/(df + 0.5)) of exact rationals;
  * the per-(query, doc) score sums term contributions in TERM ORDER
  * (sorted collect + left fold — a bare sum() would be
  * partition-order-dependent in double); ties rank by doc_id.
  */
object Bm25 {

  /** `queries`: (query_id, whitespace query text). Output:
    * (query_id, rank, doc_id, score) — score rounded to 6 for the
    * cross-engine value compare, rank cut at `k`.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (qid, text) => text.trim.split("\\s+").distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val termSet = qterms.select("term").as[String].collect().distinct.toSeq

    val toks = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast(LongType)).as("sum_dl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(termSet: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
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
}
