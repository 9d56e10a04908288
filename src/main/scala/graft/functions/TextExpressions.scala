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
}
