package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Okapi BM25 ([[Bm25.bm25TopK]]): hand-computed reference score,
  * partition independence (the term-ordered fold makes the double sum
  * deterministic), and the result-shape contract.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark shuffles data fast"),
    (2L, "spark spark spark"),
    (3L, "slow disk io"),
    (4L, "data data lake")
  ).toDF("doc_id", "text")

  test("matches a hand-computed Okapi score (k1=1.2, b=0.75)") {
    val got = Bm25.bm25TopK(docs, "doc_id", "text", Seq("q" -> "spark data"), k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getDouble(3))).toList
      .sortBy(_._2)
    // N=4, avgdl=(4+3+3+3)/4=3.25
    // idf(spark): df=2 -> ln(1+(4-2+0.5)/2.5)=ln(2); idf(data): df=2 -> ln(2)
    def s(tf: Double, dl: Double, df: Double) = {
      val idf = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.25))
    }
    val exp = Map(
      1L -> (s(1, 4, 2) + s(1, 4, 2)), // spark + data, dl=4
      2L -> s(3, 3, 2),                // spark x3, dl=3
      4L -> s(2, 3, 2))                // data x2, dl=3
    assert(got.map(_._1).toSet == exp.keySet, "doc 3 has no query term and must be absent")
    got.foreach { case (doc, _, score) =>
      assert(math.abs(score - exp(doc)) < 1e-6, s"doc $doc: $score vs ${exp(doc)}")
    }
    // Ranking follows the scores (doc 2's tf saturation beats single hits)
    val byRank = got.sortBy(_._2).map(_._1)
    assert(byRank == exp.toList.sortBy { case (d, sc) => (-sc, d) }.map(_._1))
  }

  test("score and ranking are partition-independent") {
    val a = Bm25.bm25TopK(docs, "doc_id", "text", Seq("q" -> "spark data"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val b = Bm25.bm25TopK(docs.repartition(7), "doc_id", "text",
        Seq("q" -> "spark data"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("incremental index fold reproduces the full rebuild exactly") {
    val qs = Seq("q" -> "spark data")
    val terms = Bm25.queryTerms(qs)
    val (tfA, stA) = Bm25.buildIndex(docs.where(col("doc_id") <= 2), "doc_id", "text", terms)
    val (tfB, stB) = Bm25.buildIndex(docs.where(col("doc_id") > 2), "doc_id", "text", terms)
    val folded = Bm25.scoreIndex(tfA.unionByName(tfB),
        Bm25.foldStats(stA.unionByName(stB)), qs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val full = Bm25.bm25TopK(docs, "doc_id", "text", qs, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(folded == full)
  }

  test("foldStats of zero slices yields exact zeros, not nulls") {
    val (_, st) = Bm25.buildIndex(docs, "doc_id", "text", Seq("spark"))
    val z = Bm25.foldStats(st.limit(0)).collect().head
    assert(z.getLong(0) == 0L && z.getLong(1) == 0L)
  }

  test("k cuts per query; multiple queries rank independently") {
    val got = Bm25.bm25TopK(docs, "doc_id", "text",
        Seq("q1" -> "spark", "q2" -> "data"), k = 1)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got == Map("q1" -> 2L, "q2" -> 4L)) // highest-tf doc wins each
  }
}
