package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text path — same justification as
  * [[VectorExpressions]]: array higher-order functions are
  * CodegenFallback, so `size(filter(toks, t => t.isin(words)))` pays an
  * interpreted lambda dispatch + predicate walk per element per language
  * list. [[CountInSet]] is a compact codegen'd loop over the array with a
  * hash-set membership probe — the language-ID/quality scoring hot path
  * runs it 6x per document.
  */
object TextExpressions {

  /** Count of array elements present in a static string set. Null array ->
    * null; null elements don't count (matches `filter + isin` semantics,
    * where a null predicate drops the element).
    */
  case class CountInSet(child: Expression, words: Seq[String])
      extends UnaryExpression {

    override def dataType: DataType = IntegerType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"count_in_set requires array<string>, got $other")
      }

    @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](words.size * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      var c = 0
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) c += 1
        i += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // The set is built once per task via a reference object — the
      // generated loop only pays the hash probe.
      val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val cnt = ctx.freshName("cnt")
        s"""
           |int $cnt = 0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
           |}
           |${ev.value} = $cnt;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_count_in_set"
  }

  /** Column-level counted membership (codegen'd loop, see [[CountInSet]]). */
  def countInSet(arr: Column, words: Seq[String]): Column =
    GraftShims.column(CountInSet(GraftShims.expression(arr), words))

  /** Distinct word n-gram shingles from a token array, first-occurrence
    * order — semantically `array_distinct(transform(sequence(1, cnt-n+1),
    * i => concat_ws(" ", slice(toks, i, n))))` with `cnt < n` yielding an
    * empty array, but computed in ONE kernel pass instead of four nested
    * CodegenFallback higher-order functions (each shingle otherwise pays
    * an interpreted lambda dispatch, a slice allocation, and a separate
    * concat walk). The shingle index build behind every dedup/cleaning
    * flow is exactly this expression over the corpus.
    */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"word_shingles requires array<string>, got $other")
      }

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeShingles(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      // The kernel is a static call — the generated code stays a compact
      // JIT-friendly method invocation, not an unrolled expression tree.
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextExpressions.computeShingles($a, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_word_shingles"
  }

  private val ShingleSep = UTF8String.fromString(" ")

  /** Kernel shared by [[WordShingles]]'s eval and codegen paths: distinct
    * shingles in first-occurrence order; null tokens are skipped inside a
    * shingle (concat_ws semantics). */
  def computeShingles(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(ShingleSep, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column-level shingling (see [[WordShingles]]). */
  def wordShingles(toks: Column, n: Int): Column =
    GraftShims.column(WordShingles(GraftShims.expression(toks), n))

  /** Single-pass text statistics: token count, character count, ASCII
    * alpha count, and per-language stopword hits — everything the
    * language-ID / quality-score scan needs — in ONE walk over the bytes.
    *
    * The composed built-in form costs ~12 passes per document (a regex
    * split into a token array, one [[CountInSet]] probe pass per language
    * list, plus two full-string regexes for the alpha ratio), and Catalyst
    * predicate pushdown DUPLICATES that whole chain below the projection
    * whenever a filter references the derived columns. Collapsing the scan
    * into one kernel makes both evaluations cheap.
    *
    * Exact-semantics contract (the DuckDB oracles replicate these):
    *  - tokens = `split(trim(text), "\\s+")` with space-only trim and
    *    Spark's limit -1: a leading OR trailing \t/\n/\x0B/\f/\r after
    *    trimming yields an EMPTY token on that side (counted, never
    *    probed); all-space text has zero tokens.
    *  - n_chars = `length(text)` (code points), n_alpha = count of
    *    [A-Za-z] bytes — both over the RAW untrimmed text.
    *  - stopword hits are case-sensitive exact token matches.
    */
  case class TextStats(child: Expression, langWords: Seq[Seq[String]])
      extends UnaryExpression {

    override def dataType: DataType = StructType(
      Seq(StructField("n_tokens", IntegerType, nullable = false),
        StructField("n_chars", IntegerType, nullable = false),
        StructField("n_alpha", IntegerType, nullable = false)) ++
      langWords.indices.map(i => StructField(s"hits_$i", IntegerType, nullable = false)))

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_text_stats requires string, got $other")
      }

    /** token -> bitmask of language lists containing it (<=32 lists). */
    @transient private lazy val maskMap: java.util.HashMap[UTF8String, Integer] = {
      require(langWords.size <= 32, "at most 32 stopword lists")
      val m = new java.util.HashMap[UTF8String, Integer]
      langWords.zipWithIndex.foreach { case (words, i) =>
        words.foreach { w =>
          val k = UTF8String.fromString(w)
          val prev = m.get(k)
          m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
        }
      }
      m
    }

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeTextStats(
        input.asInstanceOf[UTF8String], maskMap, langWords.size)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mapRef = ctx.addReferenceObj("maskMap", maskMap, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.TextExpressions.computeTextStats(" +
          s"$s, $mapRef, ${langWords.size});")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_text_stats"
  }

  /** Kernel shared by [[TextStats]]'s eval and codegen paths. */
  def computeTextStats(s: UTF8String,
                       maskMap: java.util.HashMap[UTF8String, Integer],
                       numLangs: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes // one copy; tokens are zero-copy views into it
    val n = bytes.length
    // Inline whitespace test for Java regex \s = [ \t\n\x0B\f\r].
    @inline def ws(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    var alpha = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      i += 1
    }
    // Space-only trim bounds (split operates on trim(text)).
    var b0 = 0
    var b1 = n
    while (b0 < b1 && bytes(b0) == ' ') b0 += 1
    while (b1 > b0 && bytes(b1 - 1) == ' ') b1 -= 1
    var nTokens = 0
    val hits = new Array[Int](numLangs)
    if (b1 > b0) {
      // Spark's split uses limit -1: a delimiter match at the start OR
      // end of the (space-trimmed) string produces an empty token on
      // that side, and both are kept.
      if (ws(bytes(b0))) nTokens += 1
      if (ws(bytes(b1 - 1))) nTokens += 1
      i = b0
      while (i < b1) {
        if (ws(bytes(i))) i += 1
        else {
          val start = i
          while (i < b1 && !ws(bytes(i))) i += 1
          nTokens += 1
          val mask = maskMap.get(UTF8String.fromBytes(bytes, start, i - start))
          if (mask != null) {
            var l = 0
            val m = mask.intValue()
            while (l < numLangs) {
              if ((m & (1 << l)) != 0) hits(l) += 1
              l += 1
            }
          }
        }
      }
    }
    val out = new Array[Any](3 + numLangs)
    out(0) = nTokens
    out(1) = s.numChars()
    out(2) = alpha
    var l = 0
    while (l < numLangs) { out(3 + l) = hits(l); l += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Column-level single-pass text stats (see [[TextStats]]). */
  def textStats(text: Column, langWords: Seq[Seq[String]]): Column =
    GraftShims.column(TextStats(GraftShims.expression(text), langWords))

  /** Word n-gram multiplicity statistics from a token array, in one pass:
    * struct(total, n_distinct, max_count) where `total` counts ALL
    * n-grams (with repeats, = max(len-n+1, 0)), `n_distinct` the distinct
    * ones, and `max_count` the highest multiplicity of any single n-gram
    * (0 when total is 0). The Gopher-style repetition signals
    * (duplicate-token fraction, top-bigram fraction) are arithmetic over
    * this struct — the composed alternative (explode n-grams, groupBy
    * (doc, gram), re-aggregate per doc) costs a corpus-sized shuffle PER
    * SIGNAL; this keeps repetition scoring scan-side at any corpus size.
    */
  case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "ngram width must be >= 1")

    override def dataType: DataType = StructType(Seq(
      StructField("total", IntegerType, nullable = false),
      StructField("n_distinct", IntegerType, nullable = false),
      StructField("max_count", IntegerType, nullable = false)))

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_ngram_stats requires array<string>, got $other")
      }

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeNgramStats(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextExpressions.computeNgramStats($a, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_ngram_stats"
  }

  /** Kernel shared by [[NgramStats]]'s eval and codegen paths. */
  def computeNgramStats(toks: ArrayData, n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val cnt = toks.numElements()
    val total = math.max(cnt - n + 1, 0)
    var distinct = 0
    var maxCount = 0
    if (total > 0) {
      val counts = new java.util.HashMap[UTF8String, Integer](total * 2)
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i <= cnt - n) {
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        val g = UTF8String.concatWs(ShingleSep, parts: _*)
        val prev = counts.get(g)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(g, Integer.valueOf(c))
        if (c > maxCount) maxCount = c
        i += 1
      }
      distinct = counts.size()
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, distinct, maxCount))
  }

  /** Column-level n-gram multiplicity stats (see [[NgramStats]]). */
  def ngramStats(toks: Column, n: Int): Column =
    GraftShims.column(NgramStats(GraftShims.expression(toks), n))

  /** Within-document duplicate-LINE counters in ONE pass over an
    * array-of-lines column: non-blank line count, distinct-line count,
    * and character sums over all vs distinct lines (untrimmed lengths;
    * blank-after-trim and null lines are skipped). The equivalent
    * array-HOF composition (filter + array_distinct + two `aggregate`
    * folds) is CodegenFallback AND references its shared subtrees from
    * four output fields, so the whole chain re-evaluates per field per
    * row — measured ~9 s vs sub-second at sf0.1 (5 k docs) on the
    * `text_dup_lines` gate. A codegen'd kernel keeps the projection in
    * whole-stage codegen where subexpression elimination collapses the
    * repeated struct references to one call.
    */
  case class LineDupStats(child: Expression, chunkWidth: Int = 0)
      extends UnaryExpression {

    override def dataType: DataType = StructType(Seq(
      StructField("n_lines", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("sum_chars", LongType, nullable = false),
      StructField("sum_chars_distinct", LongType, nullable = false)))

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_line_dup_stats requires array<string>, got $other")
      }

    override def nullSafeEval(input: Any): Any =
      TextExpressions.computeLineDupStats(input.asInstanceOf[ArrayData], chunkWidth)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextExpressions.computeLineDupStats($a, $chunkWidth);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_line_dup_stats"
  }

  /** Kernel shared by [[LineDupStats]]'s eval and codegen paths.
    * `chunkWidth <= 0`: the array elements ARE the lines. `chunkWidth
    * > 0`: the array is a TOKEN array and each line is `chunkWidth`
    * consecutive tokens joined with a single space (last line ragged) —
    * the deterministic segmentation for single-line fixtures, fused
    * here so no intermediate chunk array is ever materialized.
    */
  def computeLineDupStats(lines: ArrayData, chunkWidth: Int)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val cnt = lines.numElements()
    var n = 0L
    var sumAll = 0L
    var sumDist = 0L
    val seen = new java.util.HashSet[UTF8String](math.max(cnt * 2, 8))
    def add(l: UTF8String): Unit =
      if (l != null && l.trim().numChars() > 0) {
        n += 1
        val chars = l.numChars().toLong
        sumAll += chars
        if (seen.add(l)) sumDist += chars
      }
    if (chunkWidth <= 0) {
      var i = 0
      while (i < cnt) {
        add(if (lines.isNullAt(i)) null else lines.getUTF8String(i))
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](chunkWidth)
      var i = 0
      while (i < cnt) {
        val w = math.min(chunkWidth, cnt - i)
        var j = 0
        while (j < w) {
          parts(j) = if (lines.isNullAt(i + j)) null else lines.getUTF8String(i + j)
          j += 1
        }
        while (j < chunkWidth) { parts(j) = null; j += 1 } // concatWs skips nulls
        add(UTF8String.concatWs(ShingleSep, parts: _*))
        i += chunkWidth
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, seen.size().toLong, sumAll, sumDist))
  }

  /** Column-level duplicate-line counters (see [[LineDupStats]]). */
  def lineDupStats(lines: Column, chunkWidth: Int = 0): Column =
    GraftShims.column(LineDupStats(GraftShims.expression(lines), chunkWidth))

  /** Unicode canonical normalization (NFC/NFD/NFKC/NFKD) — the cleanup
    * pass every fingerprint/dedup pipeline needs BEFORE hashing: the
    * same visible text arrives composed ("é") and decomposed ("e"+U+0301)
    * from different crawlers, and an un-normalized corpus silently
    * splits exact-duplicate groups. Spark SQL has no normalizer
    * built-in; this delegates to the JDK's `java.text.Normalizer` (the
    * canonical Unicode implementation — identical normative output to
    * DuckDB's `nfc_normalize`) from generated code, one call per row.
    */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {

    require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"unsupported normalization form $form")

    override def dataType: DataType = StringType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"graft_unicode_normalize requires a string, got $other")
      }

    override def nullSafeEval(input: Any): Any =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        TextExpressions.normalizeString(
          input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, form))

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, c =>
        "org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.TextExpressions.normalizeString($c.toString(), " +
          s""""$form"))""")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "graft_unicode_normalize"
  }

  /** Kernel shared by [[UnicodeNormalize]]'s eval and codegen paths. */
  def normalizeString(s: String, form: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form))

  /** Column-level Unicode normalization (see [[UnicodeNormalize]]). */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    GraftShims.column(UnicodeNormalize(GraftShims.expression(text), form))
}
