package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationReport: counts exact matches, keeps clean benchmarks at 0") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "the  quick   brown fox"), // whitespace-normalized duplicate of 1
      (3L, "something else entirely")).toDF("id", "text")
    val bench = Seq(
      (100L, "the quick brown fox"),  // contaminated twice
      (101L, "never seen before")).toDF("bid", "btext")
    val got = Dedup.contaminationReport(corpus, "id", "text", bench, "bid", "btext")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (100L, 2L, Some(1L)),
      (101L, 0L, None)))
  }

  test("patternCount finds emails, urls and digit runs") {
    val df = Seq(
      ("contact me at a.b@example.com or http://x.io/page now 1234567 ok", 1L),
      ("clean text with no signals", 2L)).toDF("text", "id")
    val got = df.select(col("id"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.FilterPatterns(0)._2).as("em"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.FilterPatterns(1)._2).as("url"),
        TextAnalysis.patternCount(col("text"), TextAnalysis.FilterPatterns(2)._2).as("dig"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == Set((1L, 1, 1, 1), (2L, 0, 0, 0)))
  }
}
