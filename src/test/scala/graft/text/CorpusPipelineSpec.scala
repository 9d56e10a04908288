package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Profile

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("dupLineStats: newline corpus — dup and char fractions, blanks ignored") {
    // 4 non-blank lines, "aa bb" duplicated (1 duplicate beyond first =
    // frac 1/4; chars: 5+5+2+7=19, distinct 5+2+7=14 -> dup_char_frac
    // 5/19 = 0.263158 after the 6-place round).
    val docs = Seq(
      (1L, "aa bb\ncc\n\naa bb\nlonger1"),
      (2L, ""), // blank -> zero lines, fractions 0.0
      (3L, "solo")
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.dupLineStats(split(col("text"), "\n")).as("st"))
      .select(col("doc_id"), col("st.n_lines"), col("st.dup_line_frac"),
        col("st.dup_char_frac"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((4L, 0.25, 0.263158)))
    assert(got(2L) == ((0L, 0.0, 0.0)))
    assert(got(3L) == ((1L, 0.0, 0.0)))
  }

  test("unigramSurprisal: rare-token docs score higher, empty docs score 0") {
    val docs = Seq(
      (1L, "the the the the"),         // the most common token -> low surprisal
      (2L, "zyx qwv"),                 // singletons -> high surprisal
      (3L, "the the zyx"),             // mixed -> in between
      (4L, "  ")                       // blank -> 0 tokens, 0.0
    ).toDF("doc_id", "text")
    val got = graft.text.LanguageModel.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(4L) == ((0L, 0.0)))
    assert(got(1L)._1 == 4L && got(2L)._1 == 2L && got(3L)._1 == 3L)
    assert(got(1L)._2 < got(3L)._2 && got(3L)._2 < got(2L)._2)
    // Exact replay: P(the)=(4+2+1... ) — spot-check doc 1 analytically:
    // corpus counts: the=6, zyx=2, qwv=1; total=9, V=3;
    // P(the)=(6+1)/(9+3)=7/12; surprisal=-ln(7/12).
    assert(math.abs(got(1L)._2 - (-math.log(7.0 / 12.0))) < 5e-7)
  }

  test("sharedSurprisal == independent unigram + bigram tiers, bit-exact") {
    // Round-18 optimization: one tokenization feeding both LM tiers with
    // the smoothing vocabulary derived from the unigram tf must score
    // EXACTLY like the two independent tiers — including the capped
    // form and docs with 0/1 tokens (no bigram evidence).
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "zyx"),                       // 1 token: no bigrams
      (3L, "  "),                        // blank: neither tier has evidence
      (4L, "the cat the cat the cat"),
      (5L, "on on on zyx mat qwv")
    ).toDF("doc_id", "text")
    for (cap <- Seq(0, 3)) {
      val (uniS, biS) = graft.text.LanguageModel.sharedSurprisal(
        docs, "doc_id", "text", maxDocTokens = cap)
      val uniI = graft.text.LanguageModel.unigramSurprisal(
        docs, "doc_id", "text", maxDocTokens = cap)
      val biI = graft.text.LanguageModel.bigramSurprisal(
        docs, "doc_id", "text", maxDocTokens = cap)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(rows(uniS) === rows(uniI), s"unigram tier diverged (cap=$cap)")
      assert(rows(biS) === rows(biI), s"bigram tier diverged (cap=$cap)")
    }
  }

  test("dupLineStatsFromTokens: fused kernel == composed chunk-then-stats, incl null tokens") {
    val docs = Seq(
      (1L, Seq("a", "b", "a", "b", "c")),
      (2L, Seq("a", null, "a", null)), // concatWs skips nulls, like array_join
      (3L, Seq.empty[String])
    ).toDF("doc_id", "toks")
    def rows(c: org.apache.spark.sql.Column) =
      docs.select(col("doc_id"), c.as("st")).orderBy("doc_id")
        .collect().map(_.toString).toSeq
    val fused = rows(TextAnalysis.dupLineStatsFromTokens(col("toks"), 2))
    val composed = rows(TextAnalysis.dupLineStats(
      TextAnalysis.tokenChunkLines(col("toks"), 2)))
    assert(fused == composed)
  }

  test("tokenChunkLines: fixed-width chunks, ragged tail, blank text -> empty") {
    val docs = Seq((1L, "a b c d e"), (2L, "  ")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.tokenChunkLines(TextAnalysis.tokens(col("text")), 2).as("l"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(got(1L) == Seq("a b", "c d", "e"))
    assert(got(2L) == Seq.empty)
  }

  test("clean: filters language/quality, drops exact and near dups deterministically") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today and then it runs off to the hills"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today and then it runs off to the hills"), // exact dup -> dropped
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight and then it runs off to the hills"), // near dup of 0 -> dropped
      (3L, "el la de que y en palabras espanolas aqui y alli"), // not en -> dropped
      (4L, "a completely different english document about the engine and all of the things it is doing today in the tests"))
      .toDF("doc_id", "text")
    val got = CorpusPipeline.clean(docs, "doc_id", "text",
        lang = "en", minQuality = 0.1, jaccardThreshold = 0.5, maxDocFreq = 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 4L))
  }

  test("clean: a truncated copy loses to the complete doc it prefixes") {
    val full = "the quick brown fox jumps over the lazy dog near the river " +
      "bank today and then it runs off to the hills"
    val docs = Seq(
      (0L, full),
      // Proper prefix of doc 0 — a truncation duplicate. Too short to
      // reach the Jaccard threshold against the full copy, so only the
      // truncation tier can catch it.
      (1L, full.take(40)),
      (2L, "a completely different english document about the engine and " +
        "all of the things it is doing today in the tests"))
      .toDF("doc_id", "text")
    val got = CorpusPipeline.clean(docs, "doc_id", "text",
        lang = "en", minQuality = 0.1, jaccardThreshold = 0.5, maxDocFreq = 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 2L), s"truncated doc 1 must be dropped, got $got")
  }

  // The fold buffer bound: maxDocTokens caps the evidence window, so a
  // capped score over a long doc IS the uncapped score over its first N
  // tokens — the pathological multi-GB document contributes (and
  // buffers) at most N tokens on the task that owns its group.
  test("unigramSurprisal: maxDocTokens scores each doc over its first N tokens only") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, cap binds
      (2L, "a b c")                // under the cap, untouched
    ).toDF("doc_id", "text")
    val capped = graft.text.LanguageModel
      .unigramSurprisal(docs, "doc_id", "text", maxDocTokens = 3)
      .orderBy("doc_id").collect().toSeq
    val truncatedByHand = graft.text.LanguageModel.unigramSurprisal(
        Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(capped == truncatedByHand)
    assert(capped.head.getLong(1) == 3L) // n_tokens reports the capped window
  }

  test("bigramSurprisal: exact analytic replay; <2-token docs score 0") {
    // Corpus bigram counts: (a,b)=2, (b,a)=1; contexts: a.=2, b.=1;
    // unigram vocab V = {a, b, x} = 3.
    val docs = Seq((1L, "a b a b"), (2L, "x"), (3L, " "))
      .toDF("doc_id", "text")
    val got = graft.text.LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(2L) == ((0L, 0.0)) && got(3L) == ((0L, 0.0)))
    // doc 1: 2*ln((2+1)/(2+3)) + 1*ln((1+1)/(1+3)) over n=3 bigrams.
    val expected = -(2 * math.log(3.0 / 5.0) + math.log(2.0 / 4.0)) / 3
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - expected) < 5e-7)
  }

  test("bigramSurprisal: shuffled fluent words score higher than the fluent original") {
    // Every token is corpus-common (the order-0 filter sees identical
    // unigram stats for docs 2 and 3 — same multiset), but doc 3's PAIRS
    // are novel: the order-1 model must separate them.
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val docs = Seq(
      (1L, fluent), (2L, fluent),
      (3L, "mat the on sat cat the rug the dog and on sat the")) // shuffled doc-2 multiset
      .toDF("doc_id", "text")
    val got = graft.text.LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(3L) > got(2L),
      s"shuffled ${got(3L)} must out-surprise fluent ${got(2L)}")
    val uni = graft.text.LanguageModel.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(3L) == uni(2L), "order-0 cannot see the shuffle (same multiset)")
  }

  test("clean: the LM surprisal tier drops token salad the heuristics pass") {
    // Salad passes lang (3 English stopwords beat every other list) and
    // any low quality floor, but its singleton tokens are vocabulary-
    // foreign to the rest of the corpus -> highest surprisal.
    val salad = "the of and zzqq9 xxkk8 wwff7 qqpp6 rrtt5"
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and the cat"),
      (1L, "the quick brown fox walks under the lazy dog and the cat"),
      (2L, salad)).toDF("doc_id", "text")
    val scores = graft.text.LanguageModel.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(2L) > scores(0L) && scores(2L) > scores(1L))
    val cut = (scores(2L) + math.max(scores(0L), scores(1L))) / 2
    def keptIds(maxSurprisal: Double) =
      CorpusPipeline.clean(docs, "doc_id", "text", lang = "en",
          minQuality = 0.0, jaccardThreshold = 0.9, maxDocFreq = 100L,
          maxSurprisal = maxSurprisal)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds(Double.PositiveInfinity).contains(2L)) // tier off -> salad survives
    assert(!keptIds(cut).contains(2L))                    // tier armed -> salad dropped
    assert(keptIds(cut).contains(0L))                     // fluent docs untouched
  }

  test("clean: the order-1 tier drops a shuffle the order-0 tier cannot see") {
    val fluent = "the cat sat on the mat and the dog sat on the rug"
    val docs = Seq(
      (0L, fluent), (1L, fluent),
      (2L, "mat the on sat cat the rug the dog and on sat the")) // same multiset, shuffled
      .toDF("doc_id", "text")
    val bg = graft.text.LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cut = (bg(2L) + bg(1L)) / 2
    def keptIds(maxBigram: Double) =
      CorpusPipeline.clean(docs, "doc_id", "text", lang = "en",
          minQuality = 0.0, jaccardThreshold = 0.9, maxDocFreq = 100L,
          maxSurprisal = Double.PositiveInfinity, maxBigramSurprisal = maxBigram)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds(Double.PositiveInfinity).contains(2L))
    assert(!keptIds(cut).contains(2L))
    assert(keptIds(cut).contains(0L)) // fluent keeper survives
  }

  test("quantiles: exact interpolated per-group percentiles, one row per prob") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("g", "v")
    val got = Profile.quantiles(df, "v", Seq("g"), Seq(0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("a", 0.5)) == 2.5)   // linear interpolation between 2 and 3
    assert(got(("a", 1.0)) == 4.0)
    assert(got(("b", 0.5)) == 10.0)
  }

  test("columnProfile: one row per column with null/distinct/min/max") {
    val df = Seq((Some(1), "a"), (None, "b"), (Some(3), "a")).toDF("x", "y")
    val got = Profile.columnProfile(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("x") == ((3L, 1L, 2L, "1", "3")))
    assert(got("y") == ((3L, 0L, 2L, "a", "b")))
  }
}
