package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {

  // Hand-computed corpus for w = 8:
  //  d1/d2 share the 8-token window "a b c d e f g h" (cross-doc dup);
  //  d3 is shorter than the window; d4 is empty; d5 repeats its own
  //  8-token window WITHIN the doc (positions 0 and 8 — adjacent,
  //  non-overlapping intervals); d6/d7 share a 9-token run, so each
  //  holds TWO OVERLAPPING dup windows whose union must merge to 9.
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x a b c d e f g h z"),
      (3L, "p q r"),
      (4L, ""),
      (5L, "m n o p q r s t m n o p q r s t"),
      (6L, "u1 u2 c1 c2 c3 c4 c5 c6 c7 c8 c9"),
      (7L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 v1 v2")).toDF("doc_id", "text")
  }

  test("ngramSpanStats: cross-doc, within-doc, and overlapping dup windows") {
    val got = SpanDedup.ngramSpanStats(corpus, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got(1L) == ((10L, 3L, 1L, 8L, 0.8)))       // window at pos 0
    assert(got(2L) == ((10L, 3L, 1L, 8L, 0.8)))       // window at pos 1
    assert(got(3L) == ((3L, 0L, 0L, 0L, 0.0)))        // too short for a window
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0.0)))        // empty doc
    assert(got(5L) == ((16L, 9L, 2L, 16L, 1.0)))      // self-repeat: [0,8)+[8,16)
    assert(got(6L) == ((11L, 4L, 2L, 9L, 0.818182)))  // overlap [2,10)∪[3,11) = 9
    assert(got(7L) == ((11L, 4L, 2L, 9L, 0.818182)))
  }

  test("removeDupSpans: excises merged spans, keeps the novel remainder") {
    val got = SpanDedup.removeDupSpans(corpus, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "i j")
    assert(got(2L) == "x z")
    assert(got(3L) == "p q r")   // untouched: no window fits
    assert(got(4L) == "")
    assert(got(5L) == "")        // everything duplicated
    assert(got(6L) == "u1 u2")
    assert(got(7L) == "v1 v2")
  }

  test("ngramSpanStatsFromSlice: rejects a slice built at a different w") {
    val slice = SpanDedup.windowSlice(corpus, "doc_id", "text", w = 8)
      .cache()
    try {
      // matching w scores; mismatched w fails loudly (never silently
      // mis-stating n_windows/covered_tokens), as does a slice with the
      // width column stripped.
      assert(SpanDedup.ngramSpanStatsFromSlice(slice, corpus, "doc_id",
        "text", w = 8).count() == 7L)
      val e = intercept[IllegalArgumentException] {
        SpanDedup.ngramSpanStatsFromSlice(slice, corpus, "doc_id", "text", w = 4)
      }
      assert(e.getMessage.contains("w=4"))
      intercept[IllegalArgumentException] {
        SpanDedup.ngramSpanStatsFromSlice(slice.drop("w"), corpus,
          "doc_id", "text", w = 8)
      }
      // Fingerprint-scheme fence: a slice persisted under an older
      // scheme version (or predating the version column) is rejected
      // deliberately, never folded onto or scored silently.
      val stale = slice.withColumn("v",
        org.apache.spark.sql.functions.lit(SpanDedup.FpScheme - 1))
      val ev = intercept[IllegalArgumentException] {
        SpanDedup.ngramSpanStatsFromSlice(stale, corpus, "doc_id", "text", w = 8)
      }
      assert(ev.getMessage.contains("scheme"))
      intercept[IllegalArgumentException] {
        SpanDedup.ngramSpanStatsFromSlice(slice.drop("v"), corpus,
          "doc_id", "text", w = 8)
      }
      // Type-widened fence columns (e.g. a slice rewritten by external
      // tooling with LONG w/v) still verify: comparison is SQL-coercing.
      val widened = slice
        .withColumn("w", org.apache.spark.sql.functions.col("w").cast("long"))
        .withColumn("v", org.apache.spark.sql.functions.col("v").cast("long"))
      assert(SpanDedup.ngramSpanStatsFromSlice(widened, corpus, "doc_id",
        "text", w = 8).count() == 7L)
    } finally { slice.unpersist(); () }
  }

  test("gopherRules: rule vector arithmetic and the composed pass flag") {
    import spark.implicits._
    val passing = Iterator.fill(6)("the cat and dog have fun with that ball")
      .mkString(" ") // 54 words, mean 31/9, 5 stopword hits per repeat
    // 4 lines: 3 bullet-prefixed (0.75), 2 ellipsis-terminated — one
    // ASCII '...', one unicode '…' (0.5); the '…' also counts one
    // ellipsis occurrence in the word ratio (2 ellipses / 11 words).
    val listy = "• the first...\n - second item …\n* third\nplain tail"
    val df = Seq(
      (1L, "the be to of and that have with #a b... c"),
      (2L, ""),
      (3L, passing),
      (4L, listy)).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.gopherRules(TextAnalysis.tokens(col("text")), col("text")).as("g"))
      .select(col("doc_id"), col("g.*")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getLong(8), r.getBoolean(9)))).toMap
    // 11 words: lengths sum 31; 1 '#', 1 '...'; all words have a letter;
    // one line, neither bullet-led nor ellipsis-terminated;
    // 8 stopword hits; fails on word count and mean word length.
    assert(got(1L) == ((11L, 2.818182, 1.0, 0.090909, 0.090909, 0.0, 0.0, 8L, false)))
    assert(got(2L) == ((0L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0L, false)))
    val (n3, mean3, alpha3, hash3, ell3, bul3, ellLine3, stops3, pass3) = got(3L)
    assert(n3 == 54L && pass3)
    assert(mean3 == math.rint(31.0 / 9.0 * 1e6) / 1e6)
    assert(alpha3 == 1.0 && hash3 == 0.0 && ell3 == 0.0 && stops3 == 30L)
    assert(bul3 == 0.0 && ellLine3 == 0.0)
    val (_, _, _, _, ell4, bul4, ellLine4, _, pass4) = got(4L)
    assert(ell4 == 0.181818 && bul4 == 0.75 && ellLine4 == 0.5 && !pass4)
  }
}
