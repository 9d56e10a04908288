package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-substring span deduplication — the sliding-window form of
  * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better", ExactSubstr): any token window of width `w` whose text
  * occurs MORE THAN ONCE anywhere in the corpus (another document, or
  * the same document again) marks its token span as duplicated. Unlike
  * the document-level tiers in [[Dedup]] (exact / Jaccard / MinHash /
  * SimHash), this catches partial overlap — boilerplate headers, quoted
  * paragraphs, licence blocks — inside documents that are NOT
  * near-duplicates of each other, and its remove form excises only the
  * repeated span, keeping the novel remainder.
  *
  * Scale shape (the reference-free design, chosen for a 100 TB corpus):
  *
  *  - The suffix array the paper builds is a single-machine structure;
  *    the distributed equivalent is the window fingerprint multiset,
  *    which is ONE scan plus ONE narrow shuffle. Each document emits
  *    its `n - w + 1` windows as 20-byte fingerprints
  *    `(xxhash64(win), xxhash64(FpScheme, win), length(win))` — no
  *    window TEXT ever crosses an exchange (a window is ~`w` words, so
  *    a text-keyed shuffle would carry ~`w`× the corpus bytes). The
  *    scheme-version salt leads in h2 so it perturbs the xxhash64 seed
  *    chain AHEAD of the window bytes (a different-seed hash);
  *    salt-last would make h2 a pure function of h1 and add no entropy.
  *  - Duplicate fingerprints come from one hash-aggregate
  *    (`count > 1`); duplicated positions from the equi-join back.
  *    Both shuffles carry the 20-byte key only. AQE broadcasts the
  *    duplicate side when it is small (the realistic-corpus case).
  *  - Collision honesty: distinct window texts agreeing on BOTH
  *    64-bit hashes AND length is ~`n²/2^129` — at 10^12 windows
  *    (≈100 TB) P(any) ≈ 10^-15, below hardware corruption rates.
  *    The DuckDB oracle twin groups by the exact window STRING, so
  *    the gates verify the no-collision regime bit-for-bit rather
  *    than assuming it.
  *  - Per-document work (coverage merge, span removal) is a fold over
  *    that document's own sorted duplicate positions — bounded by the
  *    document's token count, never by the corpus (the same per-doc
  *    boundedness contract as tokenization itself; cap inputs with
  *    [[LanguageModel]]-style `maxDocTokens` upstream if a pathological
  *    doc can exceed memory).
  *
  * Reference scope anchor: the reference pipeline dedups at row
  * granularity only (load.py upsert keys); span-level dedup is part of
  * the training-data extension surface (SURVEY §7.6).
  */
object SpanDedup {

  /** Fingerprint scheme version. Bump whenever the (h1, h2, hl)
    * definition changes (it last changed in the salt-first h2 fix).
    * The constant is BOTH h2's leading salt — so a scheme bump changes
    * every fingerprint — AND the value of the `v` column every
    * persisted slice carries, which [[ngramSpanStatsFromSlice]]
    * verifies: an index written under an older scheme is fenced off
    * with a diagnostic instead of silently under-matching when
    * new-scheme slices are folded onto it (the incremental sink appends
    * slices across process restarts, so a code upgrade mid-index-life
    * is a real deployment event, not a hypothetical).
    */
  private[graft] val FpScheme = 2

  /** Sliding windows of `w` tokens as narrow fingerprints: array of
    * `(pos, h1, h2, hl)` structs, empty when the doc has fewer than `w`
    * tokens. `h2` hashes the constant scheme salt BEFORE the window
    * text: Spark's multi-arg xxhash64 seed-chains left-to-right, so
    * `xxhash64(v, win)` = `hashBytes(win, seed = hashLong(v, 42))` — a
    * genuinely different-seed hash of the bytes. (A salt-last form
    * `xxhash64(win, v)` would be `hashLong(v, h1)`, a pure function of
    * `h1` carrying ZERO extra entropy — every h1 collision would also
    * collide h2.) `hl` pins the window text length.
    */
  private def windowFps(toks: Column, w: Int): Column = {
    val fp = transform(sequence(lit(0), size(toks) - w), p => {
      val win = concat_ws(" ", slice(toks, p + 1, lit(w)))
      struct(p.as("pos"), xxhash64(win).as("h1"),
        xxhash64(lit(FpScheme), win).as("h2"), length(win).as("hl"))
    })
    when(size(toks) >= w, fp)
      .otherwise(array().cast(ArrayType(StructType(Seq(
        StructField("pos", IntegerType, nullable = false),
        StructField("h1", LongType), StructField("h2", LongType),
        StructField("hl", IntegerType))))))
  }

  /** The exploded window-fingerprint table
    * `(doc_id, pos, h1, h2, hl, w)` — one row per window position. This
    * is also the INCREMENTAL INDEX UNIT: window rows are a pure per-doc
    * function of the text, so slices over disjoint document sets fold
    * by plain append (the same argument as [[LanguageModel.tfSlice]]),
    * which is what [[graft.streaming.EventStreams.spanIndexSink]]
    * maintains per micro-batch. The constant `w` and `v` columns
    * persist the window width and the [[FpScheme]] version WITH the
    * slice (RLE-compressed to nothing in parquet) so a reader can never
    * silently score a `w=8` index as `w=4`, nor fold new-scheme slices
    * onto a stale-scheme index — [[ngramSpanStatsFromSlice]] verifies
    * both.
    */
  def windowSlice(docs: DataFrame, idCol: String, textCol: String,
                  w: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(windowFps(col("toks"), w)).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"),
        col("f.h1").as("h1"), col("f.h2").as("h2"), col("f.hl").as("hl"),
        lit(w).as("w"), lit(FpScheme).as("v"))

  /** Per-document duplicate positions: `(doc_id, dup_windows, ps)` with
    * `ps` the sorted array of window start offsets whose fingerprint
    * occurs more than once corpus-wide. Only documents with at least
    * one duplicated window appear (callers left-join).
    *
    * When `wins` is the inline [[windowSlice]], the corpus is
    * deliberately scanned TWICE (the fingerprint multiset, then the
    * positions that join against it) instead of persisting the exploded
    * table once: that table is ~28 bytes × one row per token — ~1.4×
    * the corpus itself at 100 TB — so recomputing scan-side
    * fingerprints is cheaper than caching it, and column pruning gives
    * the multiset branch a text-only scan (no ids, no positions). When
    * `wins` is a PERSISTED fold (the streaming index), both consumers
    * are cheap narrow-column scans of the stored slice.
    */
  private def dupPositions(wins: DataFrame): DataFrame = {
    // The multiset count and the re-join both key on the 20-byte
    // fingerprint; window text stays inside the scan stage.
    val dup = wins.groupBy(col("h1"), col("h2"), col("hl"))
      .agg(count(lit(1)).as("_c")).where(col("_c") > 1)
      .select(col("h1"), col("h2"), col("hl"))
    wins.join(dup, Seq("h1", "h2", "hl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_windows"),
        array_sort(collect_list(col("pos"))).as("ps"))
  }

  /** Covered-token count: length of the union of intervals
    * `[p, p + w)` over the sorted duplicate positions — a single
    * left fold (positions ascend, so one running exclusive end
    * suffices; no interval list is materialized).
    */
  private def coveredTokens(ps: Column, w: Int): Column =
    aggregate(ps,
      struct(lit(0L).as("tot"), lit(0L).as("e")),
      (acc, p) => {
        val pl = p.cast(LongType)
        val end = pl + lit(w.toLong)
        struct(
          (acc("tot") + greatest(lit(0L), end - greatest(pl, acc("e")))).as("tot"),
          greatest(acc("e"), end).as("e"))
      },
      acc => acc("tot"))

  /** Per-document duplicated-span statistics:
    * `(doc_id, n_tokens, n_windows, dup_windows, covered_tokens,
    * dup_token_frac)`. `dup_windows` counts window POSITIONS whose
    * `w`-token text occurs >1 time corpus-wide; `covered_tokens` is the
    * merged-interval union of those windows; the fraction is
    * `covered / n_tokens` (0.0 for empty docs). Every input document
    * appears (zeros when nothing is duplicated).
    */
  def ngramSpanStats(docs: DataFrame, idCol: String, textCol: String,
                     w: Int): DataFrame =
    statsFromSlice(windowSlice(docs, idCol, textCol, w),
      docs, idCol, textCol, w)

  /** [[ngramSpanStats]] over a PREBUILT (persisted, possibly
    * incrementally folded) [[windowSlice]] — the read side of the
    * streaming index: scoring the fold equals the one-shot stats
    * exactly (the slice rows are identical by the disjoint-doc append
    * argument). `docs` supplies `n_tokens` for every document,
    * including those contributing no windows.
    *
    * Guard (shared contract with
    * [[graft.streaming.EventStreams.spanIndexSink]]): the slice must
    * carry the `w` and `v` columns [[windowSlice]] persists, with
    * `w` equal to the argument and `v` equal to [[FpScheme]] — scoring
    * a `w=8` index as `w=4` would silently mis-state
    * `n_windows`/`covered_tokens`, and scoring (or folding onto) a
    * stale-scheme index would silently under-match duplicates across
    * the scheme boundary. The check is one filtered existence probe:
    * both columns are constant, so parquet row-group stats
    * (min == max == expected) prune every row group of a healthy
    * stored index and the probe is footer-only work; the full min/max
    * scan runs only on the failure path, to say what the slice
    * actually contains. Comparisons happen in SQL (type-coercing), so
    * a slice whose columns were widened to LONG by external tooling
    * gets the intended diagnostic, not a ClassCastException. (The
    * inline path [[ngramSpanStats]] builds its own slice and skips
    * all of this.)
    */
  def ngramSpanStatsFromSlice(wins: DataFrame, docs: DataFrame,
                              idCol: String, textCol: String,
                              w: Int): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    require(wins.columns.contains("w"),
      "slice lacks the 'w' width column windowSlice persists — cannot " +
        "verify it was built at the requested window width")
    require(wins.columns.contains("v"),
      s"slice lacks the 'v' fingerprint-scheme column windowSlice " +
        s"persists — it predates scheme v$FpScheme; rebuild the index")
    val bad = wins.where(col("w").isNull || col("w") =!= lit(w) ||
      col("v").isNull || col("v") =!= lit(FpScheme))
    if (!bad.isEmpty) {
      val b = wins.agg(min(col("w")), max(col("w")),
        min(col("v")), max(col("v"))).head()
      def rng(lo: Int, hi: Int) = s"[${b.get(lo)}, ${b.get(hi)}]"
      throw new IllegalArgumentException(
        s"slice was built with w in ${rng(0, 1)} (caller asked for w=$w) " +
          s"under fingerprint scheme v in ${rng(2, 3)} (this build " +
          s"writes v=$FpScheme)")
    }
    statsFromSlice(wins, docs, idCol, textCol, w)
  }

  private def statsFromSlice(wins: DataFrame, docs: DataFrame,
                             idCol: String, textCol: String,
                             w: Int): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    val perDoc = dupPositions(wins)
    docs.select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast(LongType).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      // covered_tokens is computed ONCE here: the interval-union fold is
      // a non-codegen HOF aggregate, so repeating it inside the fraction
      // could evaluate twice if CSE doesn't merge the subtrees.
      .select(col("doc_id"), col("n_tokens"),
        greatest(col("n_tokens") - lit((w - 1).toLong), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(coveredTokens(col("ps"), w), lit(0L)).as("covered_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        col("dup_windows"), col("covered_tokens"),
        when(col("n_tokens") > 0,
          round(col("covered_tokens").cast(DoubleType) /
            col("n_tokens").cast(DoubleType), 6))
          .otherwise(lit(0.0)).as("dup_token_frac"))
  }

  /** Keep-intervals — the complement `[0, n) \ ∪[p, p+w)` of the merged
    * duplicate spans — as ONE left fold over the ascending positions:
    * O(|ps|) per document, emitting each gap `[gs, ge)` (all non-empty
    * by construction) the moment the running merged span advances past
    * it. The same single-running-end shape as [[coveredTokens]].
    */
  private def keepGaps(ps: Column, n: Column, w: Int): Column = {
    val gapT = ArrayType(StructType(Seq(
      StructField("gs", LongType, nullable = false),
      StructField("ge", LongType, nullable = false))))
    val emptyGaps = array().cast(gapT)
    aggregate(ps,
      struct(emptyGaps.as("gaps"), lit(-1L).as("e")),
      (acc, p) => {
        val pl = p.cast(LongType)
        val prevEnd = when(acc("e") < 0L, lit(0L)).otherwise(acc("e"))
        struct(
          when(acc("e") >= 0L && pl <= acc("e"), acc("gaps"))
            .when(pl > prevEnd, concat(acc("gaps"),
              array(struct(prevEnd.as("gs"), pl.as("ge")))))
            .otherwise(acc("gaps")).as("gaps"),
          greatest(acc("e"), pl + lit(w.toLong)).as("e"))
      },
      acc => {
        val tailStart = when(acc("e") < 0L, lit(0L)).otherwise(acc("e"))
        when(n > tailStart, concat(acc("gaps"),
          array(struct(tailStart.as("gs"), n.as("ge")))))
          .otherwise(acc("gaps"))
      })
  }

  /** Span REMOVAL (the paper's actionable form): drop every token lying
    * inside any duplicated window and rejoin the remainder with single
    * spaces — `(doc_id, clean_text)`, the empty string when everything
    * (or the whole doc) is duplicated. Kept text is the concatenation
    * of the [[keepGaps]] gap slices — O(tokens + |ps|) per document
    * (the gaps fold is linear in `|ps|`, the slices copy each kept
    * token once), so even the saturated regime (|ps| ≈ tokens, every
    * window duplicated) stays linear in the document.
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     w: Int): DataFrame = {
    require(w >= 1, s"window width must be >= 1, got $w")
    val perDoc = dupPositions(windowSlice(docs, idCol, textCol, w))
      .select(col("doc_id"), col("ps"))
    val emptyPs = array().cast(ArrayType(IntegerType))
    docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        keepGaps(coalesce(col("ps"), emptyPs),
          size(col("toks")).cast(LongType), w).as("gaps"))
      .select(col("doc_id"),
        concat_ws(" ", flatten(transform(col("gaps"), g =>
          slice(col("toks"), g("gs").cast(IntegerType) + 1,
            (g("ge") - g("gs")).cast(IntegerType))))).as("clean_text"))
  }
}
